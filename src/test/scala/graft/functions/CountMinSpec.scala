package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins [[CountMinAgg]] against an independent reference grid (driver-side
  * map arithmetic), its partitioning-invariance (merge = element-wise add),
  * the one-sided never-undercount guarantee for EVERY key, and — with a
  * deliberately narrow sketch — that collisions produce overcounts, which
  * the estimate bound is there to cap.
  */
class CountMinSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private val W = 64 // narrow so the fixture forces collisions
  private val D = 4

  /** Reference: the counter grid CountMinAgg must produce. */
  private def refGrid(keys: Seq[Long], w: Int, d: Int): Array[Long] = {
    val g = new Array[Long](d * w)
    keys.foreach { h =>
      val h1 = h % w
      val h2 = 2L * ((h / w) % w) + 1L
      (0 until d).foreach(i => g(i * w + ((h1 + i * h2) % w).toInt) += 1L)
    }
    g
  }

  private def estOf(grid: Array[Long], h: Long, w: Int, d: Int): Long = {
    val h1 = h % w
    val h2 = 2L * ((h / w) % w) + 1L
    (0 until d).map(i => grid(i * w + ((h1 + i * h2) % w).toInt)).min
  }

  // zipf-ish fixture: key k repeated ~1000/k times. The xor-shift matters:
  // a bare odd-multiplier hash is LINEAR mod the row width (h1 = c·k mod w
  // is a bijection on k), so 60 distinct keys would never collide in row 0
  // and the overcount assertion below would be vacuous.
  private def mix(k: Long): Long = {
    val x = k * 0x9E3779B97F4A7C15L
    (x ^ (x >>> 31)) & ((1L << 60) - 1)
  }
  private val keys: Seq[Long] =
    (1 to 60).flatMap(k => Seq.fill(1000 / k)(mix(k.toLong)))

  private def gridOf(df: org.apache.spark.sql.DataFrame): Array[Long] =
    df.agg(CountMinAgg(col("h"), W, D).as("grid"))
      .collect().head.getSeq[Long](0).toArray

  test("count_min_agg builds exactly the reference counter grid") {
    gridOf(keys.toDF("h")) shouldBe refGrid(keys, W, D)
  }

  test("count_min_agg is partitioning-invariant (merge = element-wise add)") {
    gridOf(keys.toDF("h").repartition(7)) shouldBe gridOf(keys.toDF("h").repartition(1))
  }

  test("estimate never undercounts any key, and a narrow sketch overcounts some") {
    val grid = gridOf(keys.toDF("h"))
    val trueCnt = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // the estimate Column must agree with the driver-side reference...
    val viaCol = trueCnt.keys.toSeq.sorted.toDF("h")
      .crossJoin(broadcast(keys.toDF("h").agg(CountMinAgg(col("h"), W, D).as("grid"))))
      .withColumn("est", CountMinAgg.estimate("grid", "h", W, D))
      .select("h", "est").as[(Long, Long)].collect().toMap
    trueCnt.keys.foreach { h => viaCol(h) shouldBe estOf(grid, h, W, D) }
    // ...never undercount...
    trueCnt.foreach { case (h, c) => viaCol(h) should be >= c }
    // ...and with 60 keys per 64-slot row, some key collides in all rows
    trueCnt.count { case (h, c) => viaCol(h) > c } should be > 0
  }

  test("null hashes are ignored, empty input yields an all-zero grid") {
    val grid = Seq[Option[Long]](None).toDF("h")
      .agg(CountMinAgg(col("h"), W, D).as("grid"))
      .collect().head.getSeq[Long](0)
    grid.forall(_ == 0L) shouldBe true
    grid.length shouldBe W * D
  }
}
