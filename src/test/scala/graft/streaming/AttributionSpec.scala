package graft.streaming

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Hand-built edge shapes for multi-touch attribution that the oracle
  * replay can't isolate: the exact lookback boundary (a touch AT
  * conv_ts - 7d counts, one microsecond earlier doesn't), same-timestamp
  * inclusion and the (ts, event_id) tie-break, cross-user isolation,
  * purchases never counting as touches, and the zero-touch conversion
  * keeping NULL first/last instead of vanishing.
  */
class AttributionSpec extends SparkSuite with Matchers {

  private val L = EventAnalytics.AttributionLookbackUs
  private def ts(us: Long) = new java.sql.Timestamp(us / 1000) match {
    case t => t.setNanos(((us % 1000000) * 1000).toInt); t
  }

  test("attribution: boundaries, ties, isolation, zero-touch nulls") {
    import spark.implicits._
    val base = 10_000_000_000_000L // epoch micros, far from zero
    val rows = Seq(
      // user 1: conversion at base; touches probing the window edges
      (100L, ts(base), 1L, "purchase", 50.0, ""),
      (1L, ts(base - L), 1L, "view", 0.0, ""),      // AT the boundary: in
      (2L, ts(base - L - 1), 1L, "click", 0.0, ""), // 1 us earlier: out
      (3L, ts(base), 1L, "click", 0.0, ""),         // same us as conv: in
      (4L, ts(base - 5), 1L, "view", 0.0, ""),
      // a purchase inside the window is NOT a touch
      (101L, ts(base - 10), 1L, "purchase", 7.0, ""),
      // user 2's touches must not leak into user 1
      (5L, ts(base - 3), 2L, "click", 0.0, ""),
      // user 3: conversion with no touches at all
      (102L, ts(base), 3L, "purchase", 9.0, ""),
      // user 4: two touches at the SAME us — tie broken by event_id
      (103L, ts(base), 4L, "purchase", 1.0, ""),
      (6L, ts(base - 1), 4L, "view", 0.0, ""),
      (7L, ts(base - 1), 4L, "click", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val r = EventAnalytics.attribution(rows).collect()
      .map(x => x.getLong(0) -> x).toMap
    r.keySet shouldBe Set(100L, 101L, 102L, 103L)

    val c100 = r(100L)
    c100.getLong(4) shouldBe 3   // n_touches: ids 1, 3, 4 (2 is out)
    c100.getLong(5) shouldBe 1   // n_click (id 3)
    c100.getLong(6) shouldBe 2   // n_view (ids 1, 4)
    c100.getString(7) shouldBe "view" // first = id 1 at the boundary
    c100.getLong(8) shouldBe 1L
    c100.getString(9) shouldBe "click" // last = id 3 at conv ts
    c100.getLong(10) shouldBe 3L

    // the earlier purchase sees only the touches at/before ITS time
    val c101 = r(101L)
    c101.getLong(4) shouldBe 2 // its window is [base-10-L, base-10]: ids 1, 2 in; 3, 4 after
    c101.getString(7) shouldBe "click" // first = id 2 at base-L-1
    c101.getString(9) shouldBe "view"  // last = id 1 at base-L

    // zero-touch conversion survives with NULLs
    val c102 = r(102L)
    c102.getLong(4) shouldBe 0
    c102.isNullAt(7) shouldBe true
    c102.isNullAt(9) shouldBe true

    // same-us tie: event_id orders first/last
    val c103 = r(103L)
    c103.getLong(4) shouldBe 2
    c103.getString(7) shouldBe "view"  // id 6 < id 7
    c103.getString(9) shouldBe "click" // id 7
  }
}
