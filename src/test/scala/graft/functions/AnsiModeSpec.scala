package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Documents which ANSI mode the verified suite runs under, and pins that
  * the int128 exact-sum aggregate is ANSI-safe either way: its internal
  * adds are EvalMode.LEGACY by construction (a wrapping lo-half add is the
  * carry mechanism, not an overflow bug), so enabling ANSI for the session
  * must not change results or throw — the lo-carry case deliberately wraps.
  */
class AnsiModeSpec extends SparkSuite with Matchers {

  test("int128 sum survives and matches under explicit ANSI mode") {
    val key = "spark.sql.ansi.enabled"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "true")
      // forced lo-half wraps: 5 × Long.MaxValue overflows a long 4 times
      val got = spark.range(5).select(lit(Long.MaxValue).as("u"))
        .agg(ExactSum.ofUnscaled(col("u"), 8).as("s"))
        .collect()(0).getDecimal(0)
      val want = new java.math.BigDecimal(
        java.math.BigInteger.valueOf(Long.MaxValue)
          .multiply(java.math.BigInteger.valueOf(5)), 8)
      got.compareTo(want) shouldBe 0
      // money path end-to-end under ANSI
      import scala.jdk.CollectionConverters._
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("v", DoubleType)))
      val df = spark.createDataFrame(
        Seq(12.34, -56.78, 0.01).map(v => Row(java.lang.Double.valueOf(v))).asJava, schema)
      val exact = df.agg(ExactSum.sumScaled(col("v"), 8)).collect()(0).getDouble(0)
      exact shouldBe (new java.math.BigDecimal("-44.43")).doubleValue()
    } finally spark.conf.set(key, old)
  }
}
