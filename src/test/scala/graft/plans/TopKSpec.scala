package graft.plans

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins the custom whole-operator plan: TopKPerKeyExec must be the physical
  * operator, the plan must contain NO Sort below it (bounded heaps replace
  * sorting — the operator's reason to exist), exactly one hash exchange
  * (the ClusteredDistribution requirement), and the results must equal the
  * composable row_number formulation.
  */
class TopKSpec extends SparkSuite with Matchers {

  private val dir = sf("sf0.001")

  private def topk = {
    val df = graft.Tables.lineitem(spark, dir)
    TopKPerKey.perKey(df,
      keyNames = Seq("l_returnflag", "l_linestatus"),
      order = Seq("l_extendedprice" -> false, "l_orderkey" -> true,
        "l_linenumber" -> true, "l_partkey" -> true, "l_suppkey" -> true,
        "l_quantity" -> true, "l_shipdate" -> true),
      k = 3)
  }

  test("plans TopKPerKeyExec with one hash exchange and zero Sort nodes") {
    val p = topk.queryExecution.executedPlan.toString
    p should include("TopKPerKey") // TopKPerKeyExec prints with Exec stripped
    (p should not).include("Sort ")
    "Exchange hashpartitioning".r.findAllMatchIn(p).size shouldBe 1
  }

  test("equals the row_number window formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val w = Window.partitionBy($"l_returnflag", $"l_linestatus")
      .orderBy($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc,
        $"l_partkey".asc, $"l_suppkey".asc, $"l_quantity".asc, $"l_shipdate".asc)
    val windowForm = graft.Tables.lineitem(spark, dir)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3).drop("rn")
    topk.exceptAll(windowForm).count() shouldBe 0
    windowForm.exceptAll(topk).count() shouldBe 0
  }

  test("envelope: perKeyAuto picks heaps for group-like keys, window for row-like keys") {
    val df = graft.Tables.lineitem(spark, dir)
    val order = Seq("l_extendedprice" -> false, "l_orderkey" -> true,
      "l_linenumber" -> true, "l_partkey" -> true, "l_suppkey" -> true,
      "l_quantity" -> true, "l_shipdate" -> true)
    // group-like (a handful of keys): the bounded-heap operator
    val auto = TopKPerKey.perKeyAuto(df, Seq("l_returnflag", "l_linestatus"), order, 3)
    auto.queryExecution.executedPlan.toString should include("TopKPerKey")
    // row-like keys (cardinality ≈ rows): answer ≈ input doesn't fit heaps —
    // a tiny budget forces the documented fallback to the spillable window plan
    val fb = TopKPerKey.perKeyAuto(df, Seq("l_orderkey", "l_linenumber"),
      Seq("l_extendedprice" -> false), 3, maxHeldRowsPerTask = 10)
    val fbPlan = fb.queryExecution.executedPlan.toString
    (fbPlan should not).include("TopKPerKey")
    fbPlan should include("Window")
    // and both formulations agree on the same input
    val a = TopKPerKey.perKey(df, Seq("l_returnflag", "l_linestatus"), order, 3)
    val b = TopKPerKey.windowed(df, Seq("l_returnflag", "l_linestatus"), order, 3)
    a.exceptAll(b).count() shouldBe 0
    b.exceptAll(a).count() shouldBe 0
  }

  test("emits each key's rows in ascending rank order within the operator output") {
    import spark.implicits._
    // without any downstream sort, rows of one key must already be ranked
    val rows = topk.select($"l_returnflag", $"l_linestatus", $"l_extendedprice")
      .collect()
    rows.grouped(3).foreach { g =>
      if (g.length == 3 && g.map(r => (r.getString(0), r.getString(1))).distinct.length == 1)
        g.map(_.getDouble(2)).toSeq shouldBe g.map(_.getDouble(2)).sortBy(-_).toSeq
    }
  }
}
