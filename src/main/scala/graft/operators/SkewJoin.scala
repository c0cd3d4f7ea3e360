package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
