package graft.streaming

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Hand-computed pins for the integer EWMA: the exact fixed-point
  * trajectory over a known series (including a GAP hour, which must decay
  * the average by the 70% factor rather than vanish from the series), and
  * bit-identity under partition width — the property the integer
  * formulation exists for.
  */
class EwmaSpec extends SparkSuite with Matchers {

  private def ev(id: Long, hour: Int, n: Int) = {
    val base = java.sql.Timestamp.valueOf(s"2024-03-01 0$hour:10:00")
    (0 until n).map(i => (id * 100 + i, base, 1L, "click", 0.0, ""))
  }

  test("ewma: exact hand-computed trajectory with a gap hour") {
    import spark.implicits._
    // hours 00..03 for one type: counts 10, 0 (gap), 20, 5
    val rows = (ev(1, 0, 10) ++ ev(2, 2, 20) ++ ev(3, 3, 5))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.ewmaHourly(rows).collect()
      .map(x => x.getString(1) -> (x.getLong(2), x.getLong(3))).toMap
    r.keySet.map(_.takeRight(5)) shouldBe Set("00:00", "01:00", "02:00", "03:00")
    // s1 = 10e6; s2 = (0 + 70*10e6) div 100 = 7e6;
    // s3 = (30*20e6 + 70*7e6) div 100 = 10.9e6;
    // s4 = (30*5e6 + 70*10.9e6) div 100 = 9.13e6
    r("2024-03-01 00:00") shouldBe ((10L, 10000000L))
    r("2024-03-01 01:00") shouldBe ((0L, 7000000L))
    r("2024-03-01 02:00") shouldBe ((20L, 10900000L))
    r("2024-03-01 03:00") shouldBe ((5L, 9130000L))
  }

  test("ewma: bit-identical under partition width") {
    import spark.implicits._
    val rows = (for (h <- 0 to 9; i <- 0 to (h * 3) % 7)
      yield ((h * 100 + i).toLong,
        java.sql.Timestamp.valueOf(f"2024-03-01 0$h%02d:30:00"),
        i.toLong, if (i % 2 == 0) "view" else "click", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def run(parts: Int) =
      EventAnalytics.ewmaHourly(rows.repartition(parts)).collect()
        .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3))).toSeq
    run(1) shouldBe run(13)
  }
}
