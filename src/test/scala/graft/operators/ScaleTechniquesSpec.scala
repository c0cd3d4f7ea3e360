package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins the two plan-level scale techniques the star-schema queries don't
  * exercise: salted joins for known key skew, and bucketed tables for
  * shuffle-free co-located joins.
  */
class ScaleTechniquesSpec extends SparkSuite with Matchers {

  private val dir = sf("sf0.001")

  test("saltedJoin: identical result to the plain join (inner and left), skewed input") {
    import spark.implicits._
    // make lineitem skewed: 1/3 of rows forced onto one hot key
    val li = graft.Tables.lineitem(spark, dir)
      .withColumn("k", when($"l_orderkey" % 3 === 0, lit(7L)).otherwise($"l_orderkey" % 100))
      .select($"k", $"l_quantity")
    val dim = (0L to 99L).map(k => (k, s"name_$k")).toDF("k", "kname")
    for (how <- Seq("inner", "left")) {
      val plain = li.join(dim, Seq("k"), how).select($"k", $"l_quantity", $"kname")
      val salted = SkewJoin.saltedJoin(li, dim, "k", how).select($"k", $"l_quantity", $"kname")
      salted.count() shouldBe plain.count()
      salted.except(plain).count() shouldBe 0
      plain.except(salted).count() shouldBe 0
    }
  }

  test("bucketed tables: co-located join plans with NO shuffle exchange") {
    import spark.implicits._
    // warehouse dir is a temp dir set at session build (static conf)
    val o = graft.Tables.orders(spark, dir)
    val l = graft.Tables.lineitem(spark, dir)
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    // both sides bucketed on the join key with the same bucket count →
    // SortMergeJoin with zero Exchange operators: the co-location is free at
    // any scale because it was paid once, at write time.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("orders_b")
        .join(spark.table("lineitem_b"), $"o_orderkey" === $"l_orderkey")
        .select($"o_orderstatus", $"l_quantity")
      val plan = j.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      (plan should not).include("Exchange") // join reads co-located buckets directly
      j.count() should be > 0L
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
