package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Cross-batch state pins for the transformWithState milestone counter
  * (ev_tws_milestones, also DuckDB-oracle-checked): splitting the source
  * into time-ordered batches must not change the milestone sequence — the
  * ValueState-persisted count carries across batches, so milestones that
  * STRADDLE the batch boundary come out identical to the single-batch run.
  */
class TwsSpec extends SparkSuite with Matchers {

  test("2 time-split batches ≡ 1 batch ≡ the batch-side oracle") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val root = Files.createTempDirectory("tws-spec").toString

    def run(srcDir: String): Seq[(Long, Long, Long)] = {
      val out = s"$root/out-${srcDir.hashCode}"
      val ck = s"$root/ck-${srcDir.hashCode}"
      val schema = spark.read.parquet(srcDir).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      Events.milestoneStreamPass(spark, src, out, ck)
      spark.read.parquet(out)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
    }

    val events = graft.Tables.events(spark, dir)
    val mid = events.agg(expr("percentile(CAST(unix_micros(ts) AS DOUBLE), 0.5)"))
      .collect().head.getDouble(0).toLong
    // one file per time half: batch boundaries respect event time, so the
    // per-batch event-time fold is a contiguous continuation
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
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val oracle = events.filter($"event_type" === "purchase")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" % 5 === 0)
      .select($"user_id", $"rn", $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted

    oracle should not be empty
    twoBatch shouldBe oracle
    oneBatch shouldBe oracle
  }
}
