package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for file-level stats skipping and the data-quality suite that the
  * oracle replays can't exercise: the stats manifest partitions the table
  * exactly (zone maps must be complete and disjoint or skipping is
  * unsound), and the DQ constraints actually FAIL — with the exact
  * metric — on planted violations (a suite that can only pass proves
  * nothing).
  */
class StatsDqSpec extends SparkSuite with Matchers {

  test("stats manifest: complete, ordered, disjoint — skipping is sound") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val root = Formats.statsTableDir(spark, dir)
    val stats = spark.read.parquet(s"$root/_stats")
      .orderBy($"min_key").collect()
    val orders = graft.Tables.orders(spark, dir)
    // complete: file row counts sum to the table
    stats.map(_.getLong(3)).sum shouldBe orders.count()
    // each zone valid, zones pairwise disjoint and ordered
    stats.foreach(r => r.getLong(1) should be <= r.getLong(2))
    stats.sliding(2).foreach {
      case Array(a, b) => a.getLong(2) should be < b.getLong(1)
      case _ =>
    }
    // per-file min/max are TRUE bounds of the file's contents
    stats.foreach { r =>
      val f = spark.read.parquet(s"$root/${r.getString(0)}")
        .agg(org.apache.spark.sql.functions.min($"o_orderkey"),
          org.apache.spark.sql.functions.max($"o_orderkey")).collect().head
      (f.getLong(0), f.getLong(1)) shouldBe ((r.getLong(1), r.getLong(2)))
    }
  }

  test("dq suite fails every constraint on planted violations, exact metrics") {
    import spark.implicits._
    // 4 rows: one null custkey, one duplicated orderkey, one negative
    // price, one bad status, and custkey 99 references no customer
    val orders = Seq(
      (1L, Option.empty[Long], 10.0, "O"),
      (2L, Some(7L), -5.0, "F"),
      (2L, Some(7L), 20.0, "P"),
      (3L, Some(99L), 30.0, "X"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val customer = Seq(7L).toDF("c_custkey")
    val out = Formats.dqSuite(spark, orders, customer)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    out("custkey_complete") shouldBe ((0.75, false)) // 3 of 4 non-null
    out("orderkey_unique") shouldBe ((0.75, false)) // 3 distinct of 4
    out("price_positive") shouldBe ((0.75, false))
    out("status_in_set") shouldBe ((0.75, false))
    out("custkey_references_customer") shouldBe ((0.75, false)) // 1 orphan of 4
  }

  test("dq suite passes on clean data") {
    import spark.implicits._
    val orders = Seq((1L, Some(7L), 10.0, "O"), (2L, Some(7L), 20.0, "F"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val customer = Seq(7L).toDF("c_custkey")
    val out = Formats.dqSuite(spark, orders, customer).collect()
    out.length shouldBe 5
    out.foreach(r => withClue(r.getString(0)) {
      r.getDouble(1) shouldBe 1.0; r.getBoolean(2) shouldBe true
    })
  }
}
