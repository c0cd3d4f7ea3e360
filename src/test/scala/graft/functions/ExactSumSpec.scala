package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins the int128 exact-sum aggregate ([[ExactUnscaledSum]]) to the
  * decimal-cast formulation it replaced in the money queries, plus the
  * accumulator edge cases codegen can't show: a forced lo-half carry, a
  * negative total (hi sign extension), null handling, and
  * partitioning-independence of update/merge.
  */
class ExactSumSpec extends SparkSuite with Matchers {

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def moneyDf(values: Seq[java.lang.Double], parts: Int) = {
    val schema = StructType(Seq(StructField("v", DoubleType)))
    spark.createDataFrame(values.map(Row(_)).asJava, schema).repartition(parts)
  }

  test("matches sum(cast(v as decimal(20,8))) on money-like doubles, any partitioning") {
    val rnd = new scala.util.Random(42)
    // 2-decimal money grid, negatives included, with some nulls
    val values: Seq[java.lang.Double] = (1 to 5000).map { i =>
      if (i % 97 == 0) null
      else java.lang.Double.valueOf((rnd.nextInt(40000000) - 10000000) / 100.0)
    }
    for (parts <- Seq(1, 7)) {
      val df = moneyDf(values, parts)
      val exact = df.agg(ExactSum.sumScaled(col("v"), 8)).collect()(0).getDouble(0)
      val dec = df.agg(sum(col("v").cast("decimal(20,8)")).cast("double"))
        .collect()(0).getDouble(0)
      exact shouldBe dec
    }
  }

  test("forced lo-half carry: unscaled values near Long.MaxValue") {
    // 5 × (2^63 − 1) overflows a single long 4 times over — every add wraps
    // lo and must carry into hi. Expected value computed with BigDecimal.
    val big = Long.MaxValue
    val df = spark.range(5).select(lit(big).as("u"))
    val got = df.agg(ExactSum.ofUnscaled(col("u"), 8).as("s"))
      .collect()(0).getDecimal(0)
    val want = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(big).multiply(java.math.BigInteger.valueOf(5)), 8)
    got.compareTo(want) shouldBe 0
  }

  test("negative totals sign-extend through hi") {
    val df = spark.range(3).select(lit(Long.MinValue + 1).as("u"))
    val got = df.agg(ExactSum.ofUnscaled(col("u"), 2).as("s"))
      .collect()(0).getDecimal(0)
    val want = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(Long.MinValue + 1)
        .multiply(java.math.BigInteger.valueOf(3)), 2)
    got.compareTo(want) shouldBe 0
  }

  test("mixed-sign cancellation lands exactly on zero") {
    val values: Seq[java.lang.Double] =
      Seq(12345.67, -12345.67, 0.01, -0.01, 99999999.99, -99999999.99)
        .map(java.lang.Double.valueOf)
    val got = moneyDf(values, 3)
      .agg(ExactSum.sumScaled(col("v"), 8)).collect()(0).getDouble(0)
    got shouldBe 0.0
  }

  test("all-null and empty inputs yield NULL, like built-in sum") {
    val allNull = moneyDf(Seq[java.lang.Double](null, null), 2)
    allNull.agg(ExactSum.sumScaled(col("v"), 8)).collect()(0).isNullAt(0) shouldBe true
    val empty = moneyDf(Seq.empty, 1)
    empty.agg(ExactSum.sumScaled(col("v"), 8)).collect()(0).isNullAt(0) shouldBe true
  }

  test("half-away-from-zero rounding at the scale boundary, both signs") {
    // 0.25 and -0.25 are exactly representable doubles: scale-1 rounding is a
    // TRUE tie. Half-away gives 0.3 / -0.3 (matching both engines' casts);
    // half-even would give 0.2.
    val df = moneyDf(Seq(java.lang.Double.valueOf(0.25)), 1)
    df.select(ExactSum.unscaled(col("v"), 1).as("u")).collect()(0).getLong(0) shouldBe 3L
    val dfn = moneyDf(Seq(java.lang.Double.valueOf(-0.25)), 1)
    dfn.select(ExactSum.unscaled(col("v"), 1).as("u")).collect()(0).getLong(0) shouldBe -3L
  }

  test("grouped sums match the decimal path per group") {
    val rnd = new scala.util.Random(7)
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("v", DoubleType)))
    val rows = (1 to 2000).map { i =>
      Row(Int.box(i % 13), java.lang.Double.valueOf((rnd.nextInt(2000000) - 500000) / 100.0))
    }
    val df = spark.createDataFrame(rows.asJava, schema).repartition(5)
    val a = df.groupBy("k").agg(ExactSum.sumScaled(col("v"), 8).as("s")).orderBy("k").collect()
    val b = df.groupBy("k").agg(sum(col("v").cast("decimal(20,8)")).cast("double").as("s"))
      .orderBy("k").collect()
    a.map(_.getDouble(1)).toSeq shouldBe b.map(_.getDouble(1)).toSeq
  }
}
