package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for the incrementally-maintained IVF index: the append really
  * ingests exactly the arrival batch (no dropped or duplicated vectors),
  * the merged postings equal a from-scratch assignment under the same
  * frozen quantizer, and ingested vectors are served (reachable through
  * their assigned cluster's partition).
  */
class IvfIncrSpec extends SparkSuite with Matchers {

  private lazy val dir = sf("sf0.001")
  private lazy val idx = Similarity.ivfIncrIndexDir(spark, dir)

  test("postings = base build + exactly the arrival batch") {
    import spark.implicits._
    val posts = spark.read.parquet(s"$idx/postings")
    val emb = graft.Tables.embeddings(spark, dir)
    posts.count() shouldBe emb.count()
    posts.filter($"vec_id" % 7 === 3).count() shouldBe
      emb.filter($"vec_id" % 7 === 3).count()
    // no vector ingested twice, none lost
    posts.select($"vec_id").distinct().count() shouldBe emb.count()
  }

  test("appended assignment ≡ from-scratch assignment under the frozen quantizer") {
    import spark.implicits._
    val posts = spark.read.parquet(s"$idx/postings")
      .select($"vec_id", $"cluster".cast("int").as("cluster"))
    val centroids = spark.read.parquet(s"$idx/centroids")
    // recompute every vector's nearest base-trained centroid directly
    val e = graft.Tables.embeddings(spark, dir)
      .select($"vec_id", graft.functions.Exprs.vecAsDouble($"embedding").as("v"))
      .withColumn("nrm", graft.functions.Exprs.l2norm($"v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"ccos".desc, $"label".asc)
    import org.apache.spark.sql.functions._
    val fresh = e.crossJoin(broadcast(centroids))
      .select($"vec_id", $"label",
        round(graft.functions.Exprs.dot($"v", $"c") / ($"nrm" * $"cnrm"), 6).as("ccos"))
      .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"vec_id", $"label".as("cluster"))
    posts.join(fresh, Seq("vec_id"))
      .filter(posts("cluster") =!= fresh("cluster")).count() shouldBe 0
  }

  test("skewed arrival batch — the whole batch in ONE cluster — keeps recall@10 at 1.0") {
    // The drifted-quantizer worst case (r11 verdict #6): every arrival
    // lands near a single trained centroid. Planted geometry: 4
    // axis-separated clusters trained on the base; arrivals (vec_id%7==3)
    // all sit near cluster 2's centroid; the served queries (vec_id<5) are
    // hot-cluster members, so their TRUE top-10 is arrival-heavy. Because
    // the frozen quantizer assigns the batch to the probed list, the
    // incremental index must not lose any of it.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dim = 64
    def vec(axis: Int, perturbAxis: Int, eps: Float): Array[Float] = {
      val a = Array.fill(dim)(0f); a(axis) = 10f; a(perturbAxis) += eps; a
    }
    val rows = (0L until 80L).map { id =>
      val arrival = id % 7 == 3
      val lab = if (arrival || id < 5) 2 else (id % 4).toInt
      val e =
        if (arrival) { val a = vec(2, 50, 0.5f); a(40 + (id % 8).toInt) += 0.05f; a }
        else vec(lab, 40 + (id % 8).toInt, 0.1f)
      (id, e, lab)
    }
    val planted = java.nio.file.Files.createTempDirectory("graft-ivf-skew").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$planted/embeddings.parquet")

    val skIdx = Similarity.ivfIncrIndexDir(spark, planted)
    val posts = spark.read.parquet(s"$skIdx/postings")
    // the skew premise really holds: the whole batch went to ONE list
    val arrClusters = posts.filter($"vec_id" % 7 === 3)
      .select($"cluster".cast("int")).distinct().collect()
    arrClusters.length shouldBe 1
    posts.filter($"cluster" === arrClusters.head.getInt(0) && $"vec_id" % 7 === 3)
      .count() shouldBe rows.count(_._1 % 7 == 3).toLong

    // recall@10 of the served incremental index vs in-spec brute force
    val served = graft.SparkEntry.queries("sim_ivf_incr")(spark, planted)
      .select($"query_id", $"cand_id").withColumn("hit", lit(1L))
    val e = spark.read.parquet(s"$planted/embeddings.parquet")
      .select($"vec_id", graft.functions.Exprs.vecAsDouble($"embedding").as("v"))
      .withColumn("nrm", graft.functions.Exprs.l2norm($"v"))
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos".desc, $"cand_id".asc)
    val bf = broadcast(q).join(e.as("c"), $"query_id" =!= $"c.vec_id")
      .select($"query_id", $"c.vec_id".as("cand_id"),
        round(graft.functions.Exprs.dot($"qv", $"c.v") / ($"qnrm" * $"c.nrm"), 6).as("cos"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 10)
      .select($"query_id", $"cand_id")
    val recall = bf.join(served, Seq("query_id", "cand_id"), "left")
      .groupBy($"query_id")
      .agg(count(lit(1)).as("k"), sum(coalesce($"hit", lit(0L))).as("n_hit"))
      .collect()
    recall.length shouldBe 5
    recall.foreach { r =>
      withClue(s"query ${r.getLong(0)} recall@10: ") {
        r.getLong(2) shouldBe r.getLong(1) // every true neighbor served
      }
    }
  }

  test("an ingested vector is served from its cluster partition") {
    import spark.implicits._
    // pick one arrival, probe its own cluster: it must come back
    val posts = spark.read.parquet(s"$idx/postings")
    val some = posts.filter($"vec_id" % 7 === 3).select($"vec_id", $"cluster")
      .orderBy($"vec_id").limit(1).collect().head
    val served = spark.read.parquet(s"$idx/postings")
      .filter($"cluster" === some.getInt(1) && $"vec_id" === some.getLong(0))
    served.count() shouldBe 1
  }
}
