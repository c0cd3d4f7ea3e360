package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** ev_incr_rollup's single-increment merge is oracle-checked against the
  * full recompute; this pins the two claims the oracle can't state:
  *  1. the delta side's ts filter reaches the parquet scan as a pushed
  *     filter (the whole point — the nightly job reads one day, not
  *     history);
  *  2. the merge algebra COMPOSES: folding the last 6 days in one at a
  *     time (6 successive merges on decimal partials) lands on exactly the
  *     from-scratch aggregate — no drift accumulates across increments.
  */
class IncrRollupSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("delta scan pushes the ts filter down to parquet") {
    // another suite may have cached the events plan, which would route this
    // read through InMemoryTableScan (where the filter still prunes cached
    // batches, but the parquet PushedFilters assertion below can't see it)
    spark.catalog.clearCache()
    val delta = graft.Tables.events(spark, dir)
      .filter($"ts" >= lit("2024-01-25").cast("timestamp"))
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
    val scan = delta.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    scan should include("PushedFilters")
    scan should include regex "PushedFilters: \\[.*GreaterThanOrEqual\\(ts".r
  }

  test("6 successive daily merges equal the from-scratch aggregate exactly") {
    val ev = graft.Tables.events(spark, dir)
      .withColumn("day", date_format(date_trunc("day", $"ts"), "yyyy-MM-dd"))
    def partial(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"event_type", $"day")
        .agg(count(lit(1)).as("n"), sum($"value".cast("decimal(20,8)")).as("sv"))
    def merge(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.as("s").join(b.as("d"), Seq("event_type", "day"), "full_outer")
        .select($"event_type", $"day",
          (coalesce($"s.n", lit(0L)) + coalesce($"d.n", lit(0L))).as("n"),
          (coalesce($"s.sv", lit(BigDecimal(0)).cast("decimal(38,8)"))
            + coalesce($"d.sv", lit(BigDecimal(0)).cast("decimal(38,8)")))
            .cast("decimal(38,8)").as("sv"))
    val days = (25 to 30).map(d => f"2024-01-$d%02d")
    val state0 = partial(ev.filter($"day" < days.head))
    val folded = days.foldLeft(state0) { (st, day) =>
      merge(st, partial(ev.filter($"day" === day))).localCheckpoint(eager = true)
    }
    val full = partial(ev)
    val got = folded
      .select($"event_type", $"day", $"n", $"sv".cast("double"))
      .orderBy($"event_type", $"day").collect().map(_.toSeq)
    val want = full
      .select($"event_type", $"day", $"n", $"sv".cast("double"))
      .orderBy($"event_type", $"day").collect().map(_.toSeq)
    got shouldBe want
    want.length should be > 10
  }
}
