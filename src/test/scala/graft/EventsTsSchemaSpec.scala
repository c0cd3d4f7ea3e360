package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Tables.events must accept every ts layout a real writer produces —
  * BIGINT epoch-nanos (tools/make_sf1.py), TIMESTAMP (micros), and
  * TIMESTAMP_NTZ (DuckDB's default COPY) — without depending on the
  * nanosAsLong session conf matching the writer's choice. VERDICT r08 #4:
  * the BIGINT-nanos assumption silently failed 12 ev_* queries against an
  * NTZ-written sf1 events file.
  */
class EventsTsSchemaSpec extends SparkSuite with Matchers {

  test("Tables.events tolerates BIGINT-nanos, TIMESTAMP and TIMESTAMP_NTZ ts layouts") {
    import spark.implicits._
    val nanos = Seq(
      (1L, 1700000000123456789L),
      (2L, 1700000123999999999L),
      (3L, 1700003600000000000L))
    val base = nanos.toDF("event_id", "ns")

    def writeAndRead(layout: String, df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory(s"events-$layout").toString
      df.write.mode("overwrite").parquet(s"$dir/events.parquet")
      val read = Tables.events(spark, dir)
      read.schema("ts").dataType shouldBe org.apache.spark.sql.types.TimestampType
      read.select($"event_id", unix_micros($"ts"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    }

    val expected = nanos.map { case (id, ns) => (id, ns / 1000) }
    val asLong = writeAndRead("bigint", base.select($"event_id", $"ns".as("ts")))
    val asMicros = writeAndRead("micros",
      base.select($"event_id", timestamp_micros(expr("ns div 1000")).as("ts")))
    val asNtz = writeAndRead("ntz",
      base.select($"event_id",
        timestamp_micros(expr("ns div 1000")).cast("timestamp_ntz").as("ts")))

    asLong shouldBe expected
    asMicros shouldBe expected
    asNtz shouldBe expected
  }
}
