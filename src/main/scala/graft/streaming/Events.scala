package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.{QueryDef, Tables}
import graft.QueryDef.sqlChecked

/** Structured-Streaming surface over the `events` table. The reference has no
  * streaming (SURVEY §2.11); this is the north-star extension: the same
  * hourly windowed aggregation expressed (a) batch and (b) as a real
  * `readStream → window/watermark → writeStream` query driven to completion
  * with `Trigger.AvailableNow`. Both share one DuckDB oracle — the streaming
  * result must equal the batch result.
  *
  * Scale: event-time windowing keys state by (window, event_type); the
  * watermark bounds state so a 100 TB backlog streams through in bounded
  * memory instead of accumulating unbounded windows.
  */
object Events {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(20,8)")).cast("double")

  private val oracle =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour, event_type,
      | COUNT(*) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(20,8))) AS DOUBLE) AS total_value
      |FROM events GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    sqlChecked("ev_window_agg", oracle) { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
        .select(date_format($"w.start", "yyyy-MM-dd HH:mm").as("hour"),
          $"event_type", $"n_events", $"total_value")
        .orderBy($"hour", $"event_type")
    },

    sqlChecked("ev_stream_window", oracle) { (s, dir) =>
      import s.implicits._
      val sinkName = "ev_stream_window_sink"
      val src = Tables.eventsStream(s, dir)
      val agg = src
        .withWatermark("ts", "1 hour")
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
        .select(date_format($"w.start", "yyyy-MM-dd HH:mm").as("hour"),
          $"event_type", $"n_events", $"total_value")
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(sinkName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sinkName).orderBy($"hour", $"event_type")
    }
  )
}
