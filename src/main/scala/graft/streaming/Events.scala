package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.{QueryDef, Tables}
import graft.QueryDef.sqlChecked

/** Structured-Streaming surface over the `events` table. The reference has no
  * streaming (SURVEY §2.11); this is the north-star extension: the same
  * hourly windowed aggregation expressed (a) batch and (b) as a real
  * `readStream → window/watermark → writeStream` query driven to completion
  * with `Trigger.AvailableNow`.
  *
  * The streaming query runs in APPEND mode against a FILE sink — the 100 TB
  * shape: a window's aggregate row is emitted exactly once, when the
  * watermark passes the window end, and its state is then dropped, so state
  * stays bounded by the watermark horizon no matter how long the stream runs.
  * (Round 1 used complete-mode + a memory sink: the watermark was dead code,
  * state grew without bound, and every trigger collected the FULL result to
  * the driver — a scale anti-pattern this rewrite removes.)
  *
  * Append-mode consequence, pinned by the oracle: windows still open at
  * end-of-input (window_end > final watermark = max event time) are NOT
  * emitted. Both oracles state that explicitly — the batch query has no such
  * cutoff; the streaming oracle filters to closed windows.
  */
object Events {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(20,8)")).cast("double")

  private val batchOracle =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour, event_type,
      | COUNT(*) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(20,8))) AS DOUBLE) AS total_value
      |FROM events GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin

  /** Streaming twin: only windows closed under a 0-delay watermark at max
    * event time, i.e. window_end <= max(ts) over the whole input.
    */
  private val closedWindowOracle =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour, event_type,
      | COUNT(*) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(20,8))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY hour, event_type
      |HAVING date_trunc('hour', MIN(ts)) + INTERVAL 1 HOUR <= (SELECT max(ts) FROM events)
      |ORDER BY hour, event_type""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    sqlChecked("ev_window_agg", batchOracle) { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
        .select(date_format($"w.start", "yyyy-MM-dd HH:mm").as("hour"),
          $"event_type", $"n_events", $"total_value")
        .orderBy($"hour", $"event_type")
    },

    sqlChecked("ev_stream_window", closedWindowOracle) { (s, dir) =>
      import s.implicits._
      val outDir = Files.createTempDirectory("ev-stream-out").toString
      val ckDir = Files.createTempDirectory("ev-stream-ck").toString
      val agg = Tables.eventsStream(s, dir)
        .withWatermark("ts", "0 seconds")
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
        .select(date_format($"w.start", "yyyy-MM-dd HH:mm").as("hour"),
          $"event_type", $"n_events", $"total_value")
      val q = agg.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(outDir).orderBy($"hour", $"event_type")
    }
  )
}
