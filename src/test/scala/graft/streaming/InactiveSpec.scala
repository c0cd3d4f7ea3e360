package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Batch-split semantics pins for the event-time timer inactivity detector
  * (ev_tws_inactive, ADVICE r09): the DuckDB oracle models END-OF-STREAM
  * inactivity, which the query matches because its source reads the single
  * events.parquet as one batch. Under a multi-batch split the SAME operator
  * legitimately emits MORE — a mid-stream >gap pause fires the alert when
  * the watermark passes it, even if the user later returns. Both faces are
  * pinned here on planted data so neither can drift silently.
  */
class InactiveSpec extends SparkSuite with Matchers {

  private val T0 = "2025-03-01 00:00:00"

  private def planted(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("user_id", "ts_s", "event_id")
      .select($"user_id", to_timestamp($"ts_s").as("ts"),
        lit("purchase").as("event_type"), $"event_id")
  }

  private def runPass(srcDir: String): Set[(Long, String)] = {
    val root = Files.createTempDirectory("inactive-spec-run").toString
    val schema = spark.read.parquet(srcDir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    Events.inactiveStreamPass(spark, src, s"$root/out", s"$root/ck")
    spark.read.parquet(s"$root/out")
      .select(col("user_id"), date_format(col("last_purchase"), Events.TsFmt))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
  }

  test("single batch ≡ end-of-stream oracle; a batch split adds the mid-stream alert") {
    // user 1: purchases at t0 and t0+48h — a >1-day MID-stream pause, then
    //   returns (active at end of stream)
    // user 2: watermark advancer — purchases at t0+36h and t0+40h
    // user 3: purchases at t0 only — inactive at END of stream
    val all = Seq(
      (1L, T0, 101L),
      (3L, T0, 301L),
      (2L, "2025-03-02 12:00:00", 201L),
      (2L, "2025-03-02 16:00:00", 202L),
      (1L, "2025-03-03 00:00:00", 102L))
    val root = Files.createTempDirectory("inactive-spec").toString
    val t0Fmt = T0 + ".000000"

    // single file → one batch → the query's own shape: only user 3 (the
    // end-of-stream inactive) is emitted, exactly the oracle's row set
    val single = s"$root/single"
    planted(all).coalesce(1).write.mode("overwrite").parquet(single)
    runPass(single) shouldBe Set((3L, t0Fmt))

    // four time-ordered single-file batches: user 1's t0+24h timer fires in
    // the batch where the watermark (t0+36h) passes it and no user-1 row
    // re-arms first — the mid-stream alert joins user 3's end-of-stream one
    val split = s"$root/split"
    for (batch <- Seq(all.take(2), all.slice(2, 3), all.slice(3, 4), all.drop(4))) {
      planted(batch).coalesce(1).write.mode("append").parquet(split)
      Thread.sleep(1100) // distinct mtimes: FileStreamSource orders by them
    }
    runPass(split) shouldBe Set((1L, t0Fmt), (3L, t0Fmt))
  }
}
