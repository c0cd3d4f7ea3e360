package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins the stratified sampler: per-stratum sampled fraction must track the
  * requested fraction (Bernoulli tolerance), and strata asked for in full
  * must come back exactly complete.
  */
class StratifiedSampleSpec extends SparkSuite with Matchers {

  test("ta_stratified_sample: fractions honored per stratum") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val totals = graft.Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = graft.SparkEntry.queries("ta_stratified_sample")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // fr/de/es requested at 1.0 → exactly complete
    for (lang <- Seq("fr", "de", "es")) sampled(lang) shouldBe totals(lang)
    // en at 0.5, zh at 0.25 → within Bernoulli tolerance (4σ)
    def tol(n: Long, p: Double) = 4 * math.sqrt(n * p * (1 - p))
    math.abs(sampled("en") - totals("en") * 0.5) should be <= tol(totals("en"), 0.5)
    math.abs(sampled("zh") - totals("zh") * 0.25) should be <= tol(totals("zh"), 0.25)
  }
}
