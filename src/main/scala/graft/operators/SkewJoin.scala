package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.QueryDef.sqlChecked

/** Salted equi-join for skewed keys.
  *
  * A plain shuffle join on a key where one value carries a large fraction of
  * the rows puts that whole key on ONE reducer — at 100 TB a single hot key
  * (null-ish ids, "unknown" city, default SKU) stalls the stage. Salting
  * splits the hot side's rows across `saltBuckets` sub-keys and replicates
  * the other side once per bucket, so the hot key spreads over
  * `saltBuckets` reducers. AQE's skew-join handles sort-merge skew
  * post-hoc at runtime; explicit salting is the deterministic, plan-level
  * tool when the skew is known (and works for any join the optimizer can't
  * split).
  *
  * Semantics: inner or left-outer equi-join on `key`, identical to
  * `big.join(small, key, how)` — pinned by SkewJoinSpec against the plain
  * join.
  *
  * Cost model: replicates the small side `saltBuckets`× (fine — it is the
  * dimension side by assumption) in exchange for even reducer load on the
  * fact side.
  */
object SkewJoin {

  /** Join `big` (skewed on `key`) with `small` on `key`. */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      how: String = "inner", saltBuckets: Int = 16): DataFrame = {
    require(how == "inner" || how == "left", s"unsupported join type: $how")
    val salted = big.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    val joinCond: Column =
      salted(key) === replicated(key) && salted("__salt") === replicated("__salt")
    salted.join(replicated, joinCond, how)
      .drop(replicated(key))
      .drop(salted("__salt")).drop(replicated("__salt"))
  }

  /** The salted join as an oracle-checked query (it was spec-only before
    * round 10): a deliberately skewed fact key — 70% of lineitem lands on
    * the hot key 0 — joined against a part-derived dim through
    * [[saltedJoin]], then rolled up per key. The oracle runs the PLAIN
    * join in SQL: identical results is the whole claim (salting changes
    * reducer placement, never semantics). The salt itself is
    * partition-local arithmetic — no extra shuffle on the fact side; the
    * dim side replicates 16× (dimension-sized by assumption).
    */
  def defs: Seq[QueryDef] = Seq(
    sqlChecked(
      "jo_skew_salted",
      """WITH big AS (
        |  SELECT CASE WHEN l_partkey % 10 < 7 THEN 0 ELSE l_partkey END AS k,
        |         l_quantity
        |  FROM lineitem),
        |dim AS (
        |  SELECT p_partkey AS k, strlen(p_name) AS w FROM part
        |  UNION ALL SELECT 0, 1)
        |SELECT big.k, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS BIGINT) * w) AS BIGINT) AS weighted_qty
        |FROM big JOIN dim ON big.k = dim.k
        |GROUP BY big.k ORDER BY big.k""".stripMargin) { (s, dir) =>
      import s.implicits._
      val big = Tables.lineitem(s, dir)
        .select(when($"l_partkey" % 10 < 7, 0L).otherwise($"l_partkey").as("k"),
          $"l_quantity")
      val dim = Tables.part(s, dir)
        .select($"p_partkey".as("k"), length($"p_name").cast("long").as("w"))
        .union(Seq((0L, 1L)).toDF("k", "w"))
      saltedJoin(big, dim, "k")
        .groupBy($"k")
        .agg(count(lit(1)).as("n_rows"),
          sum($"l_quantity".cast("long") * $"w").as("weighted_qty"))
        .transform(d => QueryDef.largeSort(d, $"k"))
    })
}
