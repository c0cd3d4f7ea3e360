package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Error gates for the sketch aggregates (q20). The query row itself carries
  * the tolerance verdicts (hll_*_ok / p*_ok booleans, pinned TRUE by the
  * DuckDB oracle); this spec re-derives the exact answers independently and
  * additionally exercises the quantile sketch's actual guarantee — rank
  * error ≤ n/10000 — directly on the approximate values, so a sketch
  * regression is caught both here and by the driver's hash compare.
  */
class SketchSpec extends SparkSuite with Matchers {

  private val dir = sf("sf0.001")

  test("q20: exact companions match; all sketch tolerance gates are true") {
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, dir).cache()
    val row = graft.SparkEntry.queries("q20_sketch_stats")(spark, dir).collect().head
    val exact = li.agg(
      countDistinct($"l_orderkey").as("orders"),
      countDistinct($"l_partkey").as("parts")).collect().head
    row.getLong(0) shouldBe exact.getLong(0)
    row.getLong(1) shouldBe exact.getLong(1)
    for (i <- 4 to 7) withClue(s"tolerance gate at column $i") {
      row.getBoolean(i) shouldBe true
    }
    // exact percentiles really are exact: their true rank equals the target
    val n = li.count()
    for ((q, idx) <- Seq(0.5 -> 2, 0.95 -> 3)) {
      val v = row.getDouble(idx)
      val rank = li.filter($"l_extendedprice" <= v).count().toDouble / n
      rank should be >= (q - 0.02)
      rank should be <= (q + 0.02)
    }
  }

  test("q20: approx percentiles honor the rank-error guarantee (ε = 1/10000)") {
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, dir).cache()
    val n = li.count()
    val eps = 1.0 / 10000
    val ap = li.agg(
      percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("ap50"),
      percentile_approx($"l_extendedprice", lit(0.95), lit(10000)).as("ap95"))
      .collect().head
    for ((q, v) <- Seq(0.5 -> ap.getDouble(0), 0.95 -> ap.getDouble(1))) {
      // rank span [lt+1, le] of the returned value must intersect
      // [(q-eps)*n, (q+eps)*n] — the sketch's documented guarantee.
      val lt = li.filter($"l_extendedprice" < v).count()
      val le = li.filter($"l_extendedprice" <= v).count()
      withClue(s"q=$q v=$v span=[${lt + 1},$le] n=$n") {
        (lt + 1).toDouble should be <= math.ceil((q + eps) * n)
        le.toDouble should be >= math.floor((q - eps) * n)
      }
    }
  }

  test("q40: merged sketch rollup within band, overlap-aware, partition-invariant") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q40_hll_cube")(spark, dir).collect()
    rows should not be empty
    // every tolerance gate the oracle pins TRUE really is TRUE here too
    rows.foreach { r =>
      withClue(s"flag=${r.getString(0)}") {
        r.getBoolean(3) shouldBe true // union_est_ok
        r.getBoolean(4) shouldBe true // sum_overcounts (union dedups overlap)
      }
    }
    // MERGEABILITY: a sketch built per fine group then union-merged must
    // estimate the same as one sketch built directly over the coarse group,
    // and be invariant to input partitioning (merge is associative +
    // commutative — the property that makes the sketch table answer
    // rollups without rescanning raw data).
    val li = graft.Tables.lineitem(spark, dir)
    def est(df: org.apache.spark.sql.DataFrame): Map[String, Long] = df
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = est(li.groupBy($"l_returnflag")
      .agg(hll_sketch_estimate(hll_sketch_agg($"l_partkey")).as("e")))
    val merged = est(li.groupBy($"l_returnflag", $"l_linestatus")
      .agg(hll_sketch_agg($"l_partkey").as("sk"))
      .groupBy($"l_returnflag")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("e")))
    val repart = est(li.repartition(13, $"l_partkey")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(hll_sketch_agg($"l_partkey").as("sk"))
      .groupBy($"l_returnflag")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("e")))
    merged shouldBe direct
    repart shouldBe merged
  }
}
