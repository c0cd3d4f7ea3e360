package graft.queries

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Cost-based optimization surface: ANALYZE TABLE statistics change the
  * physical plan. A catalog orders table (281 KB > the 128 KB broadcast
  * threshold) filtered to one customer joins lineitem: without statistics
  * the filter's size estimate stays at file size → sort-merge join; after
  * ANALYZE … FOR COLUMNS o_custkey, selectivity estimation (ndv) shrinks
  * the filtered side to a handful of rows → broadcast hash join. This is
  * the 100 TB planning story: column stats are what let Catalyst broadcast
  * a filtered dimension it would otherwise shuffle.
  */
class CboSpec extends SparkSuite with Matchers {
  import spark.implicits._

  test("ANALYZE column stats flip the filtered join from shuffle to broadcast") {
    val dir = sf("sf0.01")
    spark.sql("DROP TABLE IF EXISTS graft_cbo_orders")
    val path = java.nio.file.Files.createTempDirectory("graft-cbo").toString
    graft.Tables.orders(spark, dir).write.mode("overwrite")
      .option("path", s"$path/orders").saveAsTable("graft_cbo_orders")
    def joinPlan() = {
      val probe = spark.table("graft_cbo_orders").filter($"o_custkey" === 7)
      graft.Tables.lineitem(spark, dir)
        .join(probe, $"l_orderkey" === $"o_orderkey")
        .queryExecution.executedPlan
    }
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "131072",
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // no stats: filter estimate = 281 KB file size > threshold → SMJ
      joinPlan().collectFirst { case j: SortMergeJoinExec => j } should not be empty
      spark.sql("ANALYZE TABLE graft_cbo_orders COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE graft_cbo_orders COMPUTE STATISTICS FOR COLUMNS o_custkey")
      // ndv(o_custkey) ≈ 1000 → ~15 estimated rows after the filter → BHJ
      joinPlan().collectFirst { case j: BroadcastHashJoinExec => j } should not be empty
    } finally {
      prev.foreach { case (k, Some(v)) => spark.conf.set(k, v); case (k, None) => spark.conf.unset(k) }
      spark.sql("DROP TABLE IF EXISTS graft_cbo_orders")
    }
  }
}
