package graft.plans

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** The SQL face of the custom functions: GraftExtensions registers
  * graft_dot / theta_agg / kll_agg so a pure-SQL user can call them. The
  * shared test session was built without the extensions conf, so this spec
  * registers the same builder list into its function registry (the exact
  * payload injectFunction receives) and drives each function through
  * `spark.sql`.
  */
class GraftExtensionsSpec extends SparkSuite with Matchers {

  private lazy val registered: Unit = {
    val reg = spark.sessionState.functionRegistry
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      reg.registerFunction(ident, info, builder)
    }
  }

  test("graft_dot is callable from SQL") {
    registered
    val v = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    v shouldBe 11.0
  }

  test("theta_agg and kll_agg run as SQL aggregates") {
    registered
    import spark.implicits._
    (1L to 1000L).map(i => (i % 7, i.toDouble)).toDF("k", "v")
      .createOrReplaceTempView("ext_probe")
    val row = spark.sql(
      """SELECT theta_agg(CAST(k AS BIGINT)) AS th, kll_agg(v) AS kll
        |FROM ext_probe""".stripMargin).collect().head
    val theta = graft.functions.ThetaAgg.wrap(row.getAs[Array[Byte]]("th"))
    theta.getEstimate shouldBe 7.0 +- 0.001 // exact below k
    val kll = graft.functions.KllAgg.wrap(row.getAs[Array[Byte]]("kll"))
    kll.getN shouldBe 1000L
    math.abs(kll.getQuantile(0.5) - 500.0) should be < 25.0
  }
}
