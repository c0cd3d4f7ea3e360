package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite
import graft.functions.Exprs

/** Pins for the NN-descent base-layer build (VERDICT r13 #2 — the
  * at-scale replacement for the exact n²/S M-NN join GraphAnn's scaladoc
  * promised): structure (partition-local, degree-bounded), monotone
  * improvement over the geometry-blind ring init, and — the claim that
  * matters — SEARCH recall with the descent-built graph within a stated
  * margin of the exact-build graph on the clustered fixture, at the same
  * fixed walk budget.
  */
class HnswNndSpec extends SparkSuite with Matchers {

  private val C = 21
  private val M = 12
  private val D = 64

  /** The HnswRecallSpec clustered fixture (same constants, same seed):
    * tight gaussian clusters, ids interleaved across shards.
    */
  private def fixture: DataFrame = {
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(C, D)(rnd.nextGaussian())
    val rows = for (j <- 0 until C; m <- 0 until M) yield {
      val id = (m * C + j).toLong
      val v = Array.tabulate(D)(d => (centers(j)(d) + 0.15 * rnd.nextGaussian()).toFloat)
      (id, v, id / C % 10)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  private def meanEdgeCos(nodes: DataFrame, edges: DataFrame): Double = {
    val vecs = nodes.select(col("vec_id"), col("v"), col("nrm"))
    edges
      .join(vecs.select(col("vec_id").as("src"), col("v").as("sv"),
        col("nrm").as("snrm")), Seq("src"))
      .join(vecs.select(col("vec_id").as("dst"), col("v").as("dv"),
        col("nrm").as("dnrm")), Seq("dst"))
      .agg(avg(Exprs.dot(col("sv"), col("dv")) / (col("snrm") * col("dnrm"))))
      .collect().head.getDouble(0)
  }

  test("descent edges are partition-local and degree-bounded") {
    import spark.implicits._
    val nodes = GraphAnn.hnswNodes(fixture).localCheckpoint()
    val e = GraphAnn.nndEdges(spark, nodes).cache()
    e.filter($"src" % GraphAnn.HnswShards =!= $"dst" % GraphAnn.HnswShards)
      .count() shouldBe 0L
    e.groupBy($"src").count()
      .filter($"count" > GraphAnn.HnswM0).count() shouldBe 0L
    // every member with >= 1 same-shard peer keeps a full list: the
    // re-rank never drops below M while candidates exist
    val n = nodes.count()
    e.select($"src").distinct().count() shouldBe n
  }

  test("each descent round only improves the graph (edge quality is monotone)") {
    import spark.implicits._
    val nodes = GraphAnn.hnswNodes(fixture).localCheckpoint()
    // the SAME init function nndEdges starts from (shared, not re-derived,
    // so the pin can't validate a stale baseline)
    val ringCos = meanEdgeCos(nodes, GraphAnn.nndInit(spark, nodes))
    val nndCos = meanEdgeCos(nodes, GraphAnn.nndEdges(spark, nodes))
    val exactCos = meanEdgeCos(nodes, GraphAnn.knnEdges(nodes, GraphAnn.HnswM0))
    info(f"mean edge cos: ring=$ringCos%.3f nnd=$nndCos%.3f exact=$exactCos%.3f")
    // descent must climb most of the way from the geometry-blind ring to
    // the exact M-NN graph (the Dong et al. convergence claim, pinned)
    nndCos should be > ringCos
    (nndCos - ringCos) should be >= 0.8 * (exactCos - ringCos)
  }

  test("clustered fixture: search recall with the NN-descent graph within 0.1 of exact") {
    import spark.implicits._
    val emb = fixture.cache()
    val nodes = GraphAnn.hnswNodes(emb).localCheckpoint()
    val uppers = Map(1 -> GraphAnn.knnEdges(nodes.filter($"lvl" >= 1),
      GraphAnn.HnswM1).localCheckpoint())
    def recallOf(base: DataFrame): Double = {
      val top = GraphAnn.hnswTopkFrom(
        GraphAnn.hnswWalk(spark, nodes, base, uppers))
        .select($"query_id", $"cand_id").withColumn("hit", lit(1L))
      // exact truth: brute-force top-k
      val e = nodes.select($"vec_id", $"v", $"nrm")
      val q = e.filter($"vec_id" < GraphAnn.HnswQueryMax)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
      val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"cand_id".asc)
      val bf = broadcast(q).join(e.as("c"), $"query_id" =!= $"c.vec_id")
        .select($"query_id", $"c.vec_id".as("cand_id"),
          round(Exprs.dot($"qv", $"c.v") / ($"qnrm" * $"c.nrm"), 6).as("cos"))
        .withColumn("rk", row_number().over(w)).filter($"rk" <= GraphAnn.HnswK)
        .select($"query_id", $"cand_id")
      val r = bf.join(top, Seq("query_id", "cand_id"), "left")
        .agg(count(lit(1)), sum(coalesce($"hit", lit(0L)))).collect().head
      r.getLong(1).toDouble / r.getLong(0)
    }
    val exactRecall = recallOf(GraphAnn.knnEdges(nodes, GraphAnn.HnswM0).localCheckpoint())
    val nndRecall = recallOf(GraphAnn.nndEdges(spark, nodes))
    info(f"search recall@10: exact-build=$exactRecall%.3f nnd-build=$nndRecall%.3f")
    // same walk, same budget shape — the approximate build may cost a
    // little recall, bounded here; the win is the build cost (n·(2M)²·iters
    // vs n²/S, measured in BASELINE.md at 20k vectors)
    nndRecall should be >= exactRecall - 0.1
  }
}
