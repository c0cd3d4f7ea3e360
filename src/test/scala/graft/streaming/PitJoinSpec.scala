package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for the point-in-time lookup (ev_pit_join): closed-open interval
  * semantics at the boundary (a fact AT a state-change instant gets the
  * NEW state), the no-covering-interval edge (a fact before its user's
  * first state carries NULL), and the current-state tail.
  */
class PitJoinSpec extends SparkSuite with Matchers {

  private val D = "2025-03-01 "

  test("boundary, pre-history and current-state facts resolve correctly") {
    import spark.implicits._
    val runs = Seq((1L, 1L, "A", "10:00"), (1L, 2L, "B", "11:00"))
      .toDF("user_id", "run_id", "state", "t")
      .select($"user_id", $"run_id", $"state",
        to_timestamp(concat(lit(D), $"t")).as("eff_from"))
    val facts = Seq(
      (101L, 1L, "10:30"), // inside [10:00, 11:00) → A
      (102L, 1L, "11:00"), // AT the change instant → the NEW state B
      (103L, 1L, "09:00"), // before any state → NULL
      (104L, 1L, "12:00")) // after the last change → current state B
      .toDF("event_id", "user_id", "t")
      .select($"event_id", $"user_id",
        to_timestamp(concat(lit(D), $"t")).as("ts"))
    val out = Events.pitJoin(spark, runs, facts)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getString(3))).toMap
    out shouldBe Map(101L -> "A", 102L -> "B", 103L -> null, 104L -> "B")
  }

  test("two runs sharing one eff_from: the later run deterministically wins") {
    import spark.implicits._
    // A state change between two same-timestamp events produces two runs
    // with identical eff_from. The interval-join oracle gives run 1 the
    // empty interval [10:00, 10:00), so every fact at or after 10:00 must
    // see B — and a fact AT 10:00 must too, on every run (the window
    // ordering (ts, kind, run_id, event_id) is total, so this cannot
    // flap with partitioning).
    val runs = Seq((1L, 1L, "A", "10:00"), (1L, 2L, "B", "10:00"))
      .toDF("user_id", "run_id", "state", "t")
      .select($"user_id", $"run_id", $"state",
        to_timestamp(concat(lit(D), $"t")).as("eff_from"))
    val facts = Seq((201L, 1L, "10:00"), (202L, 1L, "10:30"))
      .toDF("event_id", "user_id", "t")
      .select($"event_id", $"user_id",
        to_timestamp(concat(lit(D), $"t")).as("ts"))
    (1 to 3).foreach { _ =>
      val out = Events.pitJoin(spark, runs, facts)
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      out shouldBe Map(201L -> "B", 202L -> "B")
    }
  }

  test("against real data, every purchase resolves to its own or an earlier state") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val out = graft.SparkEntry.queries("ev_pit_join")(spark, dir).collect()
    out.foreach { r =>
      r.isNullAt(3) shouldBe false // facts are drawn from the history itself
      // the state interval can never START after the fact
      r.getString(4) should be <= r.getString(2)
    }
  }
}
