package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins the transitive-closure semantics of componentsOf: a chain of pairs
  * collapses into ONE group labeled by its minimum member, disconnected
  * nodes keep themselves, and convergence is reached within the diameter.
  */
class ComponentsSpec extends SparkSuite with Matchers {

  test("chain a-b, b-c, c-d is one component; singletons keep their own id") {
    import spark.implicits._
    val nodes = (0L to 6L).toDF("doc_id")
    // 0-1-2-3 chain (diameter 3, forces >1 propagation round), 4-5 pair, 6 alone
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val got = Dedup.componentsOf(spark, nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 4L, 5L -> 4L, 6L -> 6L)
  }

  /** A 400-node PATH has diameter 399: plain neighbor-min propagation needs
    * ~399 rounds, so converging inside the default maxRounds=20 is only
    * possible through the pointer-doubling shortcut (O(log diameter) ≈ 9
    * rounds plus constants) — this is the round-cap guarantee itself, not
    * just result correctness.
    */
  test("400-node chain converges within 20 rounds (pointer doubling, not diameter)") {
    import spark.implicits._
    val n = 400L
    val nodes = (0L until n).toDF("doc_id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.componentsOf(spark, nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.values.toSet shouldBe Set(0L)
    got.size shouldBe n
  }

  test("edge direction does not matter (undirected propagation)") {
    import spark.implicits._
    val nodes = (10L to 12L).toDF("doc_id")
    // edges written high-to-low: min label still reaches everyone
    val pairs = Seq((12L, 11L), (11L, 10L)).toDF("doc_a", "doc_b")
    val got = Dedup.componentsOf(spark, nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.values.toSet shouldBe Set(10L)
  }
}
