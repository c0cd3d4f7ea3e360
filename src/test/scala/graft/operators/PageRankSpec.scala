package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Structural pins for the fixed-point PageRank (pr_pagerank, also
  * DuckDB-oracle-checked on its full 5-iteration trajectory): on a star
  * graph the hub outranks every leaf, symmetric leaves tie exactly (integer
  * arithmetic — not "approximately"), total mass is conserved up to
  * documented truncation loss, and the vector is partitioning-invariant.
  */
class PageRankSpec extends SparkSuite with Matchers {

  private def star(nLeaves: Int) = {
    import spark.implicits._
    (1 to nLeaves).map(i => ("hub", s"leaf$i")).toDF("a", "b")
  }

  test("star graph: hub dominates, leaves tie exactly, mass conserved") {
    val ranks = Graph.pagerank(star(4)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    ranks should have size 5
    val leafRanks = (1 to 4).map(i => ranks(s"leaf$i")).distinct
    leafRanks should have size 1 // exact tie, not approximate
    ranks("hub") should be > leafRanks.head
    // every iteration loses < 1 micro-unit per node per integer division
    // (r DIV deg, then DIV 100): total loss < iters · n · 2 micro-units
    val total = ranks.values.sum
    total should be <= Graph.PrScale
    total should be > Graph.PrScale - Graph.PrIters * 5 * 200L
  }

  test("rank vector is invariant to input partitioning") {
    val once = Graph.pagerank(star(6)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val repart = Graph.pagerank(star(6).repartition(7)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    repart shouldBe once
  }
}
