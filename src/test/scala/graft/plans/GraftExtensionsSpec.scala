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

  test("wrong arity raises an analysis error, not an index crash") {
    registered
    import org.apache.spark.sql.AnalysisException
    val e1 = intercept[AnalysisException] {
      spark.sql("SELECT graft_dot(array(1.0d))").collect()
    }
    e1.getMessage should include("graft_dot")
    val e2 = intercept[AnalysisException] {
      spark.sql("SELECT theta_agg(1L, 2L) FROM range(3)").collect()
    }
    e2.getMessage should include("theta_agg")
    val e3 = intercept[AnalysisException] {
      spark.sql("SELECT kll_agg(1.0d, 200, 9) FROM range(3)").collect()
    }
    e3.getMessage should include("kll_agg")
  }

  test("kll_agg accepts a literal k and rejects a non-literal one") {
    registered
    import spark.implicits._
    (1L to 1000L).map(_.toDouble).toDF("v").createOrReplaceTempView("ext_probe_k")
    // a larger k tightens the published rank-error bound — check it's wired
    // through, not silently ignored (the pre-fix behavior for extra args)
    val bytes = spark.sql("SELECT kll_agg(v, 400) AS s FROM ext_probe_k")
      .collect().head.getAs[Array[Byte]]("s")
    val sk = graft.functions.KllAgg.wrap(bytes)
    sk.getK shouldBe 400
    sk.getN shouldBe 1000L
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT kll_agg(v, CAST(v AS INT)) FROM ext_probe_k").collect()
    }
    e.getMessage.toLowerCase should include("foldable")
  }
}
