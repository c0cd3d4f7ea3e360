package graft

import org.scalatest.matchers.should.Matchers

/** Runtime bloom-filter join pruning (spec-only, a planner property — the
  * CboSpec discipline): when a shuffle join's small side carries a
  * selective predicate, Spark can build a bloom filter over its join keys
  * at runtime and push `might_contain` into the FACT side's scan-filter —
  * at 100 TB this skips shuffling fact rows that can never match, the
  * single biggest saving a selective dim join has. The thresholds are
  * sized for clusters (10 GB application-side scans), so the spec lowers
  * them to demonstrate the wiring on test data, and pins the OFF behavior
  * too so the assertion can't pass vacuously.
  */
class RuntimeFilterSpec extends SparkSuite with Matchers {

  private val dir = sf("sf0.001")

  private def joinPlan(bloomOn: Boolean): String = {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force a shuffle join (a broadcast join never needs the filter) and
      // admit the small test scan on the application side
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", bloomOn.toString)
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val fact = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_quantity")
      val dim = Tables.orders(spark, dir)
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", $"o_totalprice")
      fact.join(dim, $"l_orderkey" === $"o_orderkey")
        .queryExecution.executedPlan.toString
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("selective dim predicate injects might_contain into the fact side") {
    val p = joinPlan(bloomOn = true)
    p should include("might_contain")
    p should include("bloom_filter_agg")
  }

  test("with the feature off the same join has no runtime filter (non-vacuous control)") {
    val p = joinPlan(bloomOn = false)
    (p should not).include("might_contain")
    p should include("SortMergeJoin")
  }
}
