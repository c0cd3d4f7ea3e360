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

  test("iteration join never re-shuffles the cached pre-partitioned edge list") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pairs = (1 to 2000).map(i => (s"c:${i % 50}", s"p:${i % 97}")).toDF("a", "b")
    val edges = pairs.select($"a", $"b")
      .union(pairs.select($"b".as("a"), $"a".as("b")))
      .repartition($"a").cache()
    edges.count() // materialize the cache, as pagerank() does
    // static-planning assertion: AQE wraps exchanges in query stages and
    // hides them from a plain collect — turn it off for this test only
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val deg = edges.groupBy($"a".as("node")).agg(count(lit(1)).as("deg"))
      val shares = deg.select($"node", lit(1000L).as("share"))
      val iter = edges.join(shares, edges("a") === shares("node"))
        .groupBy(edges("b").as("node")).agg(sum($"share").as("acc"))
      iter.collect()
      def hasEdgeScan(p: SparkPlan): Boolean =
        p.collectWithSubqueries { case s: InMemoryTableScanExec => s }.nonEmpty
      // the join's edge-list side must read the cache DIRECTLY — no
      // exchange between the join and the InMemoryTableScan (its cached
      // hashpartitioning(a) feeds the join as-is; only the small state
      // side and the destination rollup may shuffle) — the property that
      // lets 5 iterations move the big side zero times
      val join = iter.queryExecution.executedPlan
        .collectFirst { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
        .get
      // the state side also reads the cache (deg derives from edges) but
      // passes through an aggregate; the raw edge side does not
      def hasAgg(p: SparkPlan): Boolean = p.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }.nonEmpty
      val edgeSides = Seq(join.left, join.right)
        .filter(s => hasEdgeScan(s) && !hasAgg(s))
      edgeSides should have size 1
      edgeSides.head.collect { case e: ShuffleExchangeExec => e } shouldBe empty
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      edges.unpersist()
    }
  }

  test("rank vector is invariant to input partitioning") {
    val once = Graph.pagerank(star(6)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val repart = Graph.pagerank(star(6).repartition(7)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    repart shouldBe once
  }
}
