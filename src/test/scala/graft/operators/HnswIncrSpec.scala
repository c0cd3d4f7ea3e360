package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite
import graft.functions.Exprs

/** Pins for the incrementally-maintained graph index (VERDICT r13 #4 —
  * published HNSW's weak spot is inserts): the arrival batch's links are
  * really arrival-sized (base-to-base edges unchanged except where a
  * back-link displaced a weaker neighbor), every merged list stays
  * degree-bounded and partition-local, arrivals are REACHABLE (appear as
  * edge destinations), and — the IvfIncrSpec skewed-batch scenario in
  * graph form — a batch planted inside the query cluster is found by the
  * walk at high recall without any rebuild.
  */
class HnswIncrSpec extends SparkSuite with Matchers {

  private lazy val dir = sf("sf0.001")
  private lazy val idx = GraphAnn.hnswIncrIndexDir(spark, dir)

  test("merged lists are degree-bounded, partition-local, and cover all nodes") {
    import spark.implicits._
    val edges = spark.read.parquet(s"$idx/edges")
      .select($"src", $"dst", $"lvl".cast("int").as("lvl"),
        $"shard".cast("long").as("shard"))
    edges.filter($"src" % GraphAnn.HnswShards =!= $"dst" % GraphAnn.HnswShards)
      .count() shouldBe 0L
    edges.filter($"lvl" === 0).groupBy($"src").count()
      .filter($"count" > GraphAnn.HnswM0).count() shouldBe 0L
    edges.filter($"lvl" > 0).groupBy($"src", $"lvl").count()
      .filter($"count" > GraphAnn.HnswM1).count() shouldBe 0L
    // every vector has a base-layer adjacency list (arrivals included)
    edges.filter($"lvl" === 0).select($"src").distinct().count() shouldBe
      graft.Tables.embeddings(spark, dir).count()
  }

  test("arrivals are reachable: back-links exist, entries stay base-frozen") {
    import spark.implicits._
    val edges = spark.read.parquet(s"$idx/edges")
      .select($"src", $"dst", $"lvl".cast("int").as("lvl"))
    val m = GraphAnn.HnswIncrMod; val r = GraphAnn.HnswIncrRes
    // some base node points AT an arrival on the base layer — without
    // back-links the batch would be silently unreachable
    edges.filter($"lvl" === 0 && $"src" % m =!= r && $"dst" % m === r)
      .count() should be > 0L
    val nodes = spark.read.parquet(s"$idx/nodes")
    val entries = GraphAnn.baseEntries(nodes).collect()
    entries.foreach { row =>
      row.getLong(1) % m should not be r.toLong
    }
    // the frozen-entry contract's hole (a shard whose only promoted
    // members are arrivals would never be searched) stays closed on the
    // fixture: every shard keeps a base entry
    entries.length shouldBe GraphAnn.HnswShards
  }

  test("ingest is arrival-sized: base-to-base lists change only by back-link displacement") {
    import spark.implicits._
    val m0 = GraphAnn.HnswM0
    val mod = GraphAnn.HnswIncrMod; val res = GraphAnn.HnswIncrRes
    val nodes = spark.read.parquet(s"$idx/nodes")
    val base = nodes.filter($"vec_id" % mod =!= res)
    val baseOnly = GraphAnn.knnEdges(base, m0)
      .select($"src", $"dst")
    val merged = spark.read.parquet(s"$idx/edges")
      .filter($"lvl".cast("int") === 0).select($"src", $"dst")
    // a base edge missing from the merged graph must be explained by an
    // arrival back-link on the same src (the prune displaced it)
    val dropped = baseOnly.join(merged, Seq("src", "dst"), "left_anti")
    val srcWithArrival = merged.filter($"dst" % mod === res)
      .select($"src").distinct()
    dropped.join(srcWithArrival, Seq("src"), "left_anti").count() shouldBe 0L
  }

  test("skewed arrival batch planted in the query cluster is served at high recall") {
    import spark.implicits._
    val dim = 16
    val mod = GraphAnn.HnswIncrMod; val res = GraphAnn.HnswIncrRes
    // 4 axis-separated clusters; queries (vec_id < 5) AND every arrival
    // (vec_id % 7 == 3) sit in cluster 2, so the true top-10 of each
    // query is arrival-heavy — the insert must make the batch findable
    def vec(axis: Int, perturbAxis: Int, eps: Float): Array[Float] = {
      val a = Array.fill(dim)(0f); a(axis) = 10f; a(perturbAxis) += eps; a
    }
    val rows = (0L until 160L).map { id =>
      val arrival = id % mod == res
      val lab = if (arrival || id < 5) 2 else (id % 4).toInt
      val e =
        if (arrival) { val a = vec(2, 10, 0.5f); a(8 + (id % 4).toInt) += 0.05f; a }
        else vec(lab, 8 + (id % 4).toInt, 0.1f)
      (id, e, lab)
    }
    val planted = java.nio.file.Files.createTempDirectory("graft-hnsw-skew").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$planted/embeddings.parquet")

    val served = graft.SparkEntry.queries("sim_hnsw_incr")(spark, planted).cache()
    // the premise holds: arrivals dominate the served top-10
    served.filter($"from_arrival").count() should be > 0L

    // recall@10 vs in-spec brute force over the FULL corpus (base+batch)
    val e = spark.read.parquet(s"$planted/embeddings.parquet")
      .select($"vec_id", Exprs.vecAsDouble($"embedding").as("v"))
      .withColumn("nrm", Exprs.l2norm($"v"))
    val q = e.filter($"vec_id" < GraphAnn.HnswQueryMax)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"cand_id".asc)
    val bf = broadcast(q).join(e.as("c"), $"query_id" =!= $"c.vec_id")
      .select($"query_id", $"c.vec_id".as("cand_id"),
        round(Exprs.dot($"qv", $"c.v") / ($"qnrm" * $"c.nrm"), 6).as("cos"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= GraphAnn.HnswK)
      .select($"query_id", $"cand_id")
    val hits = bf.join(
        served.select($"query_id", $"cand_id").withColumn("hit", lit(1L)),
        Seq("query_id", "cand_id"), "left")
      .agg(count(lit(1)), sum(coalesce($"hit", lit(0L)))).collect().head
    val recall = hits.getLong(1).toDouble / hits.getLong(0)
    val arrHitFrac = served.filter($"from_arrival").count().toDouble /
      served.count()
    info(f"planted-batch recall@10=$recall%.3f arrival fraction of served=$arrHitFrac%.3f")
    // Unlike IvfIncrSpec's 1.0 pin (IVF scans the WHOLE probed inverted
    // list), the graph serve is budget-bounded by construction — beam
    // HnswBeam with M0 base edges visits a fixed node count per shard, so
    // even a perfect index recalls < 1.0 when the true neighbor set
    // outnumbers the walk budget (measured 0.80 here with 63 cluster
    // members against a ~40-node/shard walk). The pin: the inserted batch
    // is found at the same recall grade the fused-build walk achieves on
    // clustered data (HnswRecallSpec's 0.8 floor), not silently lost.
    recall should be >= 0.75
    arrHitFrac should be > 0.0
  }
}
