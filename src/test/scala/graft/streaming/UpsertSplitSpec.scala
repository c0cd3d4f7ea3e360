package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Split-invariance pin for the streaming upsert sink (r10 verdict #6):
  * ev_stream_upsert claims its materialized state equals the batch
  * aggregate REGARDLESS of how the source was split into micro-batches.
  * StreamRestartSpec pins the restart dimension; this spec pins the SPLIT
  * dimension — the same planted events laid out as 1, 2 and 5 files (read
  * with maxFilesPerTrigger=1, so file count = micro-batch count) must
  * compact to the identical per-key state, byte-equal to the batch
  * groupBy.
  */
class UpsertSplitSpec extends SparkSuite with Matchers {

  test("1-, 2- and 5-batch splits all compact to the batch aggregate") {
    import spark.implicits._
    // 40 events over 8 users; values with a decimal tail so the exact
    // DECIMAL sum would expose any float drift between split shapes
    val events = (1L to 40L).map(i =>
      (i % 8, f"2025-03-01 ${i % 24}%02d:00:00", i * 0.125 + 0.01, i))
      .toDF("user_id", "ts_s", "value", "event_id")
      .select($"user_id", to_timestamp($"ts_s").as("ts"), $"value", $"event_id")
    val expected = events.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(20,8)")).cast("double").as("total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    for (nFiles <- Seq(1, 2, 5)) {
      val root = Files.createTempDirectory(s"upsert-split-$nFiles").toString
      val src = s"$root/src"
      events.repartition(nFiles).write.mode("overwrite").parquet(src)
      EventAnalytics.upsertStreamPass(spark, src, s"$root/out", s"$root/ck")
      val got = EventAnalytics.upsertState(spark, s"$root/out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      withClue(s"$nFiles-file split: ") { got shouldBe expected }
    }
  }
}
