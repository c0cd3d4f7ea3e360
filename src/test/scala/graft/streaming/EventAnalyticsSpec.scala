package graft.streaming

import java.sql.Timestamp
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Semantics of the event-analytics operators on planted micro-datasets
  * where the expected output is hand-checked — the oracle rows prove
  * cross-engine equality on the synthetic events table; these prove the
  * stage rules (funnel horizon, cohort offsets, LOCF carry) mean what they
  * claim on adversarial cases the random data may not contain.
  */
class EventAnalyticsSpec extends SparkSuite with Matchers {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def eventsDf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.map { case (u, t, ty) => (u, ts(t), ty) }
      .toDF("user_id", "ts", "event_type")
  }

  test("funnel: horizon gates each stage; pre-signup clicks never qualify") {
    val events = eventsDf(Seq(
      // u1: full conversion inside the 12 h horizon at each stage
      (1L, "2024-01-01 00:00:00", "signup"),
      (1L, "2024-01-01 01:00:00", "click"),
      (1L, "2024-01-01 02:00:00", "purchase"),
      // u2: click 13 h after signup — outside horizon, so NO stage-2 even
      // though a purchase follows it
      (2L, "2024-01-01 00:00:00", "signup"),
      (2L, "2024-01-01 13:00:00", "click"),
      (2L, "2024-01-01 14:00:00", "purchase"),
      // u3: click ok, purchase 14 h after the click — stage 3 missed
      (3L, "2024-01-01 00:00:00", "signup"),
      (3L, "2024-01-01 01:00:00", "click"),
      (3L, "2024-01-01 15:00:00", "purchase"),
      // u4: only a PRE-signup click — time order matters, not just presence
      (4L, "2024-01-01 01:00:00", "signup"),
      (4L, "2024-01-01 00:30:00", "click"),
      // u5: no signup — not in the funnel at all
      (5L, "2024-01-01 00:00:00", "click"),
      (5L, "2024-01-01 00:10:00", "purchase")))
    val got = EventAnalytics.funnel(events).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    got shouldBe Array(
      (1L, "2024-01-01 00:00:00.000000", "2024-01-01 01:00:00.000000", "2024-01-01 02:00:00.000000"),
      (2L, "2024-01-01 00:00:00.000000", null, null),
      (3L, "2024-01-01 00:00:00.000000", "2024-01-01 01:00:00.000000", null),
      (4L, "2024-01-01 01:00:00.000000", null, null))
  }

  test("funnel: stage time is the FIRST qualifying event, not any qualifying event") {
    val events = eventsDf(Seq(
      (1L, "2024-01-01 00:00:00", "signup"),
      (1L, "2024-01-01 03:00:00", "click"), // second qualifying click
      (1L, "2024-01-01 01:00:00", "click"), // first qualifying click wins
      // qualifying relative to the FIRST click (01:00 + 12 h), would not
      // qualify relative to the second
      (1L, "2024-01-01 12:30:00", "purchase")))
    val got = EventAnalytics.funnel(events).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    got shouldBe Array(
      ("2024-01-01 00:00:00.000000", "2024-01-01 01:00:00.000000", "2024-01-01 12:30:00.000000"))
  }

  test("retention: offsets anchor to each user's own cohort day; offset > 7 drops") {
    val events = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 12:00:00", "click"), // same (user, day) → counts once
      (1L, "2024-01-02 10:00:00", "view"),
      (1L, "2024-01-04 10:00:00", "view"),
      (2L, "2024-01-02 10:00:00", "view"), // later cohort, own day-0
      (2L, "2024-01-10 10:00:00", "view"))) // offset 8 → excluded
    val got = EventAnalytics.retention(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got shouldBe Array(
      ("2024-01-01", 0L, 1L),
      ("2024-01-01", 1L, 1L),
      ("2024-01-01", 3L, 1L),
      ("2024-01-02", 0L, 1L))
  }

  test("gapfill: missing hours appear with zero counts and LOCF carries the last observed value") {
    val events = eventsDf(Seq(
      (1L, "2024-01-01 00:10:00", "view"),
      (1L, "2024-01-01 00:20:00", "view"),
      // hour 01 empty for view
      (1L, "2024-01-01 02:30:00", "view"),
      (1L, "2024-01-01 01:15:00", "click")))
      .withColumn("value", org.apache.spark.sql.functions.lit(10.0))
    val got = EventAnalytics.gapfillHourly(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    // spine: hours 00..02 × {click, view} = 6 rows, gaps zero-filled
    got shouldBe Array(
      // click's first observation is hour 01, so its hour-00 LOCF is NULL —
      // a leading gap has nothing to carry (distinct from the zero fill)
      ("2024-01-01 00:00", "click", 0L, 0.0, None),
      ("2024-01-01 00:00", "view", 2L, 20.0, Some(20.0)),
      ("2024-01-01 01:00", "click", 1L, 10.0, Some(10.0)),
      ("2024-01-01 01:00", "view", 0L, 0.0, Some(20.0)), // LOCF: hour-00 total carried
      ("2024-01-01 02:00", "click", 0L, 0.0, Some(10.0)),
      ("2024-01-01 02:00", "view", 1L, 10.0, Some(10.0)))
  }

  test("plan shapes: funnel and retention stay on one user_id partitioning, no cartesian") {
    val dir = sf("sf0.001")
    for (q <- Seq("ev_funnel", "ev_retention")) {
      val p = withPlainSort {
        graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      }
      (p should not).include("CartesianProduct")
      (p should not).include("BroadcastNestedLoopJoin")
    }
  }
}
