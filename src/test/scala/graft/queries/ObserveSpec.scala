package graft.queries

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins Spark's `observe`/`Observation` API as the in-flight data-quality
  * mechanism: a production pipeline should count rows/nulls/violations
  * DURING its main job, not pay a second monitoring scan. The observed
  * metrics must equal a standalone aggregation of the same input.
  */
class ObserveSpec extends SparkSuite with Matchers {

  test("observe collects row/null/violation counts during the main job") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = sf("sf0.001")
    val obs = new org.apache.spark.sql.Observation("quality")
    // metrics attach BEFORE the filter, so they profile the full input
    // while the job computes its filtered output
    val observed = graft.Tables.orders(spark, dir)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when($"o_custkey".isNull, 1L).otherwise(0L)).as("n_null_cust"),
        sum(when($"o_totalprice" < 0, 1L).otherwise(0L)).as("n_neg_price"))
      .filter($"o_orderstatus" === "F")
    val filteredCount = observed.count() // the "real work" action
    val metrics = obs.get
    val expectRows = graft.Tables.orders(spark, dir).count()
    filteredCount should be < expectRows
    metrics("n_rows") shouldBe expectRows
    metrics("n_null_cust") shouldBe 0L
    metrics("n_neg_price") shouldBe 0L
  }
}
