package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for the shared graph intermediate (r10 verdict #2): the
  * orders⋈lineitem scan + (orderkey, partkey) dedup must run ONCE — in the
  * write job that builds [[Graph.purchaseIncidence]] — and both graph
  * queries' edge builds must consume only the materialized incidence
  * table. The query RESULTS are lineage-truncated (localCheckpoint /
  * driver-profile rows), so the scans are pinned on the exposed edge-build
  * frames, and the write-once contract on the observable build counter.
  */
class GraphStagedSpec extends SparkSuite with Matchers {

  test("edge builds read only the purchase incidence — no fact-table re-scan") {
    val dir = sf("sf0.001")
    for ((name, df) <- Seq(
        "pagerankEdges" -> Graph.pagerankEdges(spark, dir),
        "copurchaseEdges" -> Graph.copurchaseEdges(spark, dir))) {
      val p = df.queryExecution.executedPlan.toString
      withClue(s"$name plan: ") {
        (p should not).include("lineitem.parquet")
        (p should not).include("orders.parquet")
        p should include("graft-graph-ti")
      }
    }
  }

  test("running both graph queries builds the incidence exactly once") {
    spark.conf.set(graft.QueryDef.PlainSortConf, "true")
    try {
      val dir = sf("sf0.001")
      Graph.purchaseIncidence(spark, dir) // settle the write outside the timing
      val before = Graph.incidenceBuilds.get()
      graft.SparkEntry.queries("pr_pagerank")(spark, dir).collect()
      graft.SparkEntry.queries("pr_triangles")(spark, dir).collect()
      Graph.incidenceBuilds.get() shouldBe before // write-once: no rebuilds
    } finally spark.conf.unset(graft.QueryDef.PlainSortConf)
  }

  test("racing first calls build the incidence exactly once (r11 verdict #5)") {
    // A distinct cache key over the SAME data: the map is keyed by the raw
    // dir string, so the trailing separator forces a fresh first-call even
    // though other suites already built sf("sf0.001") in this JVM.
    val dir = sf("sf0.001") + java.io.File.separator
    val before = Graph.incidenceBuilds.get()
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futs = (1 to 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = { gate.await(); Graph.purchaseIncidence(spark, dir) }
        })
      }
      val paths = futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS)).toSet
      paths.size shouldBe 1 // the loser blocked and read the winner's dir
      Graph.incidenceBuilds.get() shouldBe before + 1 // builder ran once, not twice
    } finally pool.shutdownNow()
  }

  test("the incidence is the distinct (custkey, orderkey, partkey) set of the raw join") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val ti = spark.read.parquet(Graph.purchaseIncidence(spark, dir))
    ti.schema.fieldNames.toSeq shouldBe Seq("custkey", "orderkey", "partkey")
    val raw = graft.Tables.lineitem(spark, dir).select($"l_orderkey", $"l_partkey")
      .join(graft.Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey", $"l_orderkey", $"l_partkey").distinct()
    ti.count() shouldBe raw.count()
    // identical as a SET, not just in count
    ti.join(raw, ti("custkey") === raw("o_custkey")
      && ti("orderkey") === raw("l_orderkey")
      && ti("partkey") === raw("l_partkey")).count() shouldBe raw.count()
  }
}
