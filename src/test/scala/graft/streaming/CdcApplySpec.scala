package graft.streaming

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** ev_cdc_apply's values are oracle-checked; this pins the PLAN claim: the
  * last-writer-wins merge is a partial-aggregable aggregate (map-side
  * combine collapses each key before the shuffle), NOT the window
  * row_number formulation the oracle uses — so the plan has exactly one
  * exchange and no window sort. Also pins the tombstone edge cases the
  * derived log may not cover densely: a key whose LATEST change is a
  * delete is absent even with earlier upserts, and a key re-inserted after
  * a delete is present.
  */
class CdcApplySpec extends SparkSuite with Matchers {

  test("merge plans as one exchange, no window operator") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Events.cdcApplyPlan(spark, sf("sf0.001")).queryExecution.executedPlan
      plan.collect { case w: WindowExec => w } shouldBe empty
      plan.collect { case e: ShuffleExchangeExec => e }.size shouldBe 1
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("delete-last hides the key; re-insert after delete resurrects it") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val log = Seq(
      (1L, 10L, "U", 1.0), (2L, 10L, "U", 2.0), (3L, 10L, "D", 0.0), // dead
      (4L, 20L, "U", 4.0), (5L, 20L, "D", 0.0), (6L, 20L, "U", 6.0), // alive
      (7L, 30L, "D", 0.0) // tombstone-only key: dead
    ).toDF("seq", "key", "op", "val")
    val snap = log.groupBy($"key")
      .agg(max($"seq").as("last_seq"),
        max_by(struct($"op", $"val"), $"seq").as("last"),
        count(lit(1)).as("n_changes"))
      .filter($"last.op" =!= "D")
      .select($"key", $"last_seq", $"last.val".as("last_val"), $"n_changes")
      .orderBy($"key")
      .collect()
    snap.map(_.getLong(0)) shouldBe Array(20L)
    snap.head.getLong(1) shouldBe 6L
    snap.head.getDouble(2) shouldBe 6.0
    snap.head.getLong(3) shouldBe 3L
  }
}
