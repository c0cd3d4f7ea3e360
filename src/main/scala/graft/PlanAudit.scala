package graft

/** Plan-audit tool: prints the exchange/join profile of named queries at
  * sf0.001 with the presentation sort degraded to a plain orderBy (so the
  * INNER plan is visible — the largeSort checkpoint otherwise hides it
  * behind an RDD scan). Usage:
  * `sbt "runMain graft.PlanAudit ev_late_backfill ta_logreg_score"`.
  * This is how the r11 backfill double-scan was caught (8 exchanges → 4).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("plan-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set(QueryDef.PlainSortConf, "true")
    val dir = "/root/testdata/sf0.001"
    for (name <- args) {
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(s, dir)
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)[^\n]*".r
        .findAllIn(plan).toSeq
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      println(s"exchanges=${exchanges.size} bhj=$bhj smj=$smj")
      exchanges.foreach(e => println("  " + e.take(110)))
    }
    s.stop()
  }
}
