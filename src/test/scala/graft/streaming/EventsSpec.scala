package graft.streaming

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Streaming ≡ batch parity: the append-mode file-sink streaming query must
  * produce exactly the batch aggregate restricted to closed windows (every
  * window except those still open at the final watermark = max event time).
  */
class EventsSpec extends SparkSuite with Matchers {

  test("ev_stream_window equals batch result minus still-open windows") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val batch = graft.SparkEntry.queries("ev_window_agg")(spark, dir).cache()
    val stream = graft.SparkEntry.queries("ev_stream_window")(spark, dir).cache()
    val maxTs = graft.Tables.events(spark, dir).agg(max(col("ts"))).collect().head.getTimestamp(0)
    val closed = batch.filter(
      to_timestamp(col("hour"), "yyyy-MM-dd HH:mm") + expr("INTERVAL 1 HOUR") <= lit(maxTs))
    stream.count() should be > 0L
    stream.count() shouldBe closed.count()
    stream.except(closed).count() shouldBe 0
    closed.except(stream).count() shouldBe 0
    // and the stream emitted strictly fewer rows than the unbounded batch
    stream.count() should be < batch.count()
  }
}
