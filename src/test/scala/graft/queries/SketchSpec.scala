package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Error gates for the sketch aggregates (q20): approximate answers must
  * land within their advertised error of the exact ones.
  */
class SketchSpec extends SparkSuite with Matchers {

  private val dir = sf("sf0.001")

  test("q20: HLL distinct within 5% of exact; approx percentiles within 2% rank") {
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, dir).cache()
    val sketch = graft.SparkEntry.queries("q20_sketch_stats")(spark, dir).collect().head
    val exact = li.agg(
      countDistinct($"l_orderkey").as("orders"),
      countDistinct($"l_partkey").as("parts")).collect().head
    math.abs(sketch.getLong(0) - exact.getLong(0)).toDouble / exact.getLong(0) should be < 0.05
    math.abs(sketch.getLong(1) - exact.getLong(1)).toDouble / exact.getLong(1) should be < 0.05
    // percentile: the approx answer's true rank must be within ±2% of target
    val n = li.count()
    for ((q, idx) <- Seq(0.5 -> 2, 0.95 -> 3)) {
      val v = sketch.getDouble(idx)
      val rank = li.filter($"l_extendedprice" <= v).count().toDouble / n
      rank should be >= (q - 0.02)
      rank should be <= (q + 0.02)
    }
  }
}
