package graft.streaming

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Stateful-streaming ≡ batch parity for gap sessionization: the
  * flatMapGroupsWithState query must emit exactly the batch sessions that
  * are CLOSED at end-of-input (session_end + gap <= final watermark = max
  * event time), each exactly once, with identical rollups.
  */
class SessionizeSpec extends SparkSuite with Matchers {

  test("ev_sessionize_stream equals batch sessions closed at the final watermark") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val batch = graft.SparkEntry.queries("ev_sessionize")(spark, dir).cache()
    val stream = graft.SparkEntry.queries("ev_sessionize_stream")(spark, dir).cache()
    val maxTs = graft.Tables.events(spark, dir)
      .agg(max(unix_micros(col("ts")))).collect().head.getLong(0)
    val closed = batch.filter(
      unix_micros(to_timestamp(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        + Events.SessionGapUs <= maxTs)
    stream.count() should be > 0L
    withClue(s"stream=${stream.count()} closed=${closed.count()}: ") {
      stream.except(closed).count() shouldBe 0
      closed.except(stream).count() shouldBe 0
    }
    // multi-event sessions exist (the gap actually groups something)
    batch.filter(col("n_events") > 1).count() should be > 0L
  }
}
