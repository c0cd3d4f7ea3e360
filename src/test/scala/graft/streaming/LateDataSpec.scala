package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Late-data semantics under a 0-second watermark: once batch 1 (the NEWER
  * half of events, by construction) advances the watermark to its max
  * event time, every row of batch 2 (the older half) arrives with its
  * window already closed — the aggregate must DROP all of them, account
  * for them in numRowsDroppedByWatermark, and emit nothing new. This is
  * the accounting contract that bounds streaming state at 100 TB: without
  * the drop, every straggler would reopen a window and state would never
  * be evictable.
  */
class LateDataSpec extends SparkSuite with Matchers {

  test("rows behind the watermark are dropped and counted, not aggregated") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val root = Files.createTempDirectory("late-spec").toString
    val (src, out, ck) = (s"$root/src", s"$root/out", s"$root/ck")

    val events = graft.Tables.events(spark, dir).cache()
    val mid = events.agg(expr("percentile(CAST(unix_micros(ts) AS DOUBLE), 0.5)"))
      .collect().head.getDouble(0).toLong
    val newerHalf = events.filter(unix_micros($"ts") > mid)
    val olderHalf = events.filter(unix_micros($"ts") <= mid)

    // two checkpoint-resumed passes: pass 1 ingests the newer half and
    // persists its watermark; pass 2 adds the older half, every row of
    // which is then behind the restored watermark
    def runPass(): Long = {
      val schema = spark.read.parquet(src).schema
      val q = spark.readStream.schema(schema).parquet(src)
        .withWatermark("ts", "0 seconds")
        .groupBy(window($"ts", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .select($"w.start".as("ws"), $"n")
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum
    }
    newerHalf.coalesce(1).write.mode("append").parquet(src)
    runPass()
    olderHalf.coalesce(1).write.mode("append").parquet(src)
    val dropped = runPass()

    // every older-half row is behind the restored watermark; the state
    // operator accounts for the ones that reach it (Spark splits drops
    // between the pre-aggregate watermark filter and the state store, so
    // the metric is a witness, not the full count — the OUTPUT equality
    // below is the complete semantic pin)
    dropped should be > 0L
    // and the emitted result is exactly the newer half's CLOSED windows —
    // no window was reopened or polluted by late rows
    val wmUs = newerHalf.agg(max(unix_micros($"ts"))).collect().head.getLong(0)
    val expected = newerHalf
      .groupBy(window($"ts", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .filter(unix_micros($"w.end") <= wmUs)
      .select($"w.start".as("ws"), $"n")
      .collect().map(_.toString).sorted
    spark.read.parquet(out).collect().map(_.toString).sorted shouldBe expected
  }
}
