package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for the DATA-DRIVEN layer ladder (VERDICT r13 #3): the arithmetic
  * promotion `(vec_id DIV shards) % 8^ℓ == 0` makes the effective level
  * count a function of corpus size — layer ℓ carries edges iff some shard
  * holds ≥ 2 members, so the ladder grows ~log_8(n/shards) with no
  * configuration. This spec pins the membership arithmetic in closed
  * form, the activeLevels derivation at two corpus sizes, and an
  * end-to-end search over a ≥ 3-upper-layer ladder.
  */
class HnswLevelsSpec extends SparkSuite with Matchers {

  /** 8192 ids → m = vec_id DIV 4 ∈ [0, 2048): three active upper layers
    * (1024/128/16 members) plus an inactive cap layer (1 member/shard).
    * 4-dim vectors keep the planted exact build cheap — the ladder is
    * pure id arithmetic, geometry-independent by design.
    */
  private def ladder(n: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0L until n).map { id =>
      (id, Array.fill(4)(rnd.nextGaussian().toFloat), (id % 10).toInt)
    }.toDF("vec_id", "embedding", "label")
  }

  test("per-layer membership counts match the closed form at 8192 vectors") {
    import spark.implicits._
    val nodes = GraphAnn.hnswNodes(ladder(8192)).cache()
    // count(lvl >= l) = |{m in [0, 2048) : m % 8^l == 0}| x 4 shards
    val counts = nodes.groupBy($"lvl").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    def atLeast(l: Int) = counts.filter(_._1 >= l).values.sum
    atLeast(1) shouldBe 1024L // 2048/8 per shard x 4
    atLeast(2) shouldBe 128L  // 2048/64 per shard x 4
    atLeast(3) shouldBe 16L   // 2048/512 per shard x 4
    atLeast(4) shouldBe 4L    // only m = 0, one per shard
    // layer 4 has exactly one member per shard -> cannot carry edges ->
    // the derived ladder stops at 3 upper layers
    GraphAnn.activeLevels(nodes) shouldBe Seq(1, 2, 3)
  }

  test("the ladder height derives from corpus size, not config") {
    // 500 vectors (the sf0.001 shape): m <= 124 -> layer 2 holds m in
    // {0, 64} = 2 per shard (active), layer 3 only m = 0 (inactive)
    GraphAnn.activeLevels(GraphAnn.hnswNodes(ladder(500))) shouldBe Seq(1, 2)
    // 128 vectors: m <= 31 -> only layer 1 carries edges
    GraphAnn.activeLevels(GraphAnn.hnswNodes(ladder(128))) shouldBe Seq(1)
  }

  test("search runs end-to-end over a 3-upper-layer ladder") {
    import spark.implicits._
    val top = GraphAnn.hnswTopk(spark, ladder(8192)).cache()
    // every query gets a full k: the multi-layer descent reached the base
    top.groupBy($"query_id").count().collect()
      .foreach(r => r.getLong(1) shouldBe GraphAnn.HnswK.toLong)
    top.select($"query_id").distinct().count() shouldBe GraphAnn.HnswQueryMax.toLong
    // ranks are dense 1..k per query
    top.filter($"rk" < 1 || $"rk" > GraphAnn.HnswK).count() shouldBe 0L
  }
}
