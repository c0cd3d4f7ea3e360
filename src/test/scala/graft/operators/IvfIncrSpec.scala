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
