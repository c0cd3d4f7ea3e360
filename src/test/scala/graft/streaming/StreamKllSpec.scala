package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite
import graft.functions.KllAgg

/** Cross-batch state pin for the streaming KLL window aggregate
  * (ev_stream_quantiles, also DuckDB-oracle-checked): splitting the source
  * into time-ordered micro-batches must not change the per-window summary —
  * the serialized sketch buffer carries through the state store and merges
  * with the next batch's partial. At sf0.001 every window holds ≤ k=200
  * values, so the sketch is in EXACT mode and the pin is equality, not a
  * tolerance: same per-window counts and identical p50 estimates between
  * the 2-batch and 1-batch runs.
  */
class StreamKllSpec extends SparkSuite with Matchers {

  test("2 time-split batches ≡ 1 batch for per-window sketch count and p50") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val root = Files.createTempDirectory("stream-kll-spec").toString

    def run(srcDir: String): Map[String, (Long, Double)] = {
      val out = s"$root/out-${srcDir.hashCode}"
      val ck = s"$root/ck-${srcDir.hashCode}"
      val schema = spark.read.parquet(srcDir).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      src.withWatermark("ts", "0 seconds")
        .groupBy(window($"ts", "1 hour").as("w"))
        .agg(KllAgg($"value").as("sk"))
        .select(date_format($"w.start", "yyyy-MM-dd HH:mm").as("hour"), $"sk")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      spark.read.parquet(out).collect().map { r =>
        val sk = KllAgg.wrap(r.getAs[Array[Byte]]("sk"))
        r.getString(0) -> (sk.getN, sk.getQuantile(0.5))
      }.toMap
    }

    val events = graft.Tables.events(spark, dir)
      .select($"ts", $"value")
    val mid = events.agg(expr("percentile(CAST(unix_micros(ts) AS DOUBLE), 0.5)"))
      .collect().head.getDouble(0).toLong
    val split = s"$root/split"
    events.filter(unix_micros($"ts") <= mid).coalesce(1)
      .write.mode("append").parquet(split)
    Thread.sleep(1000) // distinct mtimes: FileStreamSource orders by them
    events.filter(unix_micros($"ts") > mid).coalesce(1)
      .write.mode("append").parquet(split)
    val single = s"$root/single"
    events.coalesce(1).write.mode("overwrite").parquet(single)

    val twoBatch = run(split)
    val oneBatch = run(single)
    oneBatch should not be empty
    // the 2-batch run closes the same windows except possibly those held
    // open at the first batch's watermark then closed by the second —
    // AvailableNow drains everything, so the closed sets match
    twoBatch.keySet shouldBe oneBatch.keySet
    // windows straddling the split boundary prove the state-store merge:
    // per-window n and exact-mode p50 must be identical
    oneBatch.foreach { case (hour, (n, q50)) =>
      withClue(s"hour=$hour: ") {
        twoBatch(hour)._1 shouldBe n
        twoBatch(hour)._2 shouldBe q50
      }
    }
    // and at least one window actually straddles the boundary
    val sdf = new java.text.SimpleDateFormat("yyyy-MM-dd HH:00")
    sdf.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val midHour = sdf.format(new java.util.Date(mid / 1000))
    assert(oneBatch.keys.exists(_.startsWith(midHour.substring(0, 13))))
  }
}
