package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Error gates for the sketch aggregates (q20). The query row itself now
  * carries the tolerance verdicts (hll_*_ok / p*_ok booleans, pinned TRUE by
  * the DuckDB oracle); this spec re-derives the exact answers independently
  * and additionally checks the approximate answers' true rank, so a sketch
  * regression is caught both here and by the driver's hash compare.
  */
class SketchSpec extends SparkSuite with Matchers {

  private val dir = sf("sf0.001")

  test("q20: exact companions match; all sketch tolerance gates are true") {
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, dir).cache()
    val row = graft.SparkEntry.queries("q20_sketch_stats")(spark, dir).collect().head
    val exact = li.agg(
      countDistinct($"l_orderkey").as("orders"),
      countDistinct($"l_partkey").as("parts")).collect().head
    row.getLong(0) shouldBe exact.getLong(0)
    row.getLong(1) shouldBe exact.getLong(1)
    for (i <- 4 to 7) withClue(s"tolerance gate at column $i") {
      row.getBoolean(i) shouldBe true
    }
    // exact percentiles really are exact: their true rank equals the target
    val n = li.count()
    for ((q, idx) <- Seq(0.5 -> 2, 0.95 -> 3)) {
      val v = row.getDouble(idx)
      val rank = li.filter($"l_extendedprice" <= v).count().toDouble / n
      rank should be >= (q - 0.02)
      rank should be <= (q + 0.02)
    }
  }
}
