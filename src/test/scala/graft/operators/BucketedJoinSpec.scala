package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** io_bucketed_join's value is oracle-checked; this pins the PLAN claim that
  * justifies bucketing at 100 TB: with broadcast off (forcing the join shape
  * a 100 TB×100 GB join would take), the scan→join→agg pipeline over the
  * bucketed tables contains ZERO shuffle exchanges — the join reads
  * co-located buckets and the per-customer rollup reuses the same
  * distribution. The same query over the plain parquet shuffles BOTH sides.
  */
class BucketedJoinSpec extends SparkSuite with Matchers {

  test("bucketed join + bucket-key agg plans with zero shuffle exchanges") {
    val dir = sf("sf0.001")
    val (ot, ct) = Formats.bucketedTables(spark, dir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Formats.bucketedJoinPlan(spark, ot, ct)
        .queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      shuffles shouldBe empty
      // and it IS the sort-merge shape (not some degenerate single-partition collapse)
      plan.collectFirst { case j: SortMergeJoinExec => j } should not be empty
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("the identical query over plain parquet shuffles both sides") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plain = graft.Tables.orders(spark, dir)
        .select($"o_custkey", $"o_totalprice")
        .join(graft.Tables.customer(spark, dir)
          .select($"c_custkey", $"c_mktsegment"), $"o_custkey" === $"c_custkey")
        .groupBy($"o_custkey", $"c_mktsegment")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_orders"))
      val shuffles = plain.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }
      shuffles.size should be >= 2
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("bucketed result equals the plain-join result") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val (ot, ct) = Formats.bucketedTables(spark, dir)
    val bucketed = Formats.bucketedJoinPlan(spark, ot, ct)
      .orderBy($"o_custkey", $"c_mktsegment").collect()
    val plain = graft.Tables.orders(spark, dir)
      .select($"o_custkey", $"o_totalprice")
      .join(graft.Tables.customer(spark, dir)
        .select($"c_custkey", $"c_mktsegment"), $"o_custkey" === $"c_custkey")
      .groupBy($"o_custkey", $"c_mktsegment")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_orders"),
        graft.functions.ExactSum.sumScaled($"o_totalprice", 8).as("sum_spend"))
      .orderBy($"o_custkey", $"c_mktsegment").collect()
    bucketed should contain theSameElementsInOrderAs plain
  }
}
