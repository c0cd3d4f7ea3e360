package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when SQL-expressible)
  * a DuckDB oracle over the same parquet tables. Column names and row order
  * must agree between the two — every query ends in a deterministic ORDER BY.
  *
  * Money/measure aggregates are computed over `DECIMAL`-cast inputs and cast
  * back to double at the end: exact decimal arithmetic makes the result
  * bit-identical regardless of engine, partitioning, or summation order —
  * a float `sum` over 32 partitions is not reproducible, a decimal one is.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sqlChecked(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  /** Deterministic presentation sort for a SMALL result of an EXPENSIVE
    * plan: one shuffle to a single partition + local sort — same total
    * order as `orderBy(cols)` (the keys are a total order on these
    * outputs), but without `orderBy`'s RangePartitioning, whose bounds
    * SAMPLING re-executes the child plan (measured: the O(n²) cosine
    * baseline paid its full join twice, 4.8 s sorted vs 2.4 s sort-free,
    * to order 990 rows). Scale note: only used where the output is
    * K-BOUNDED BY CONSTRUCTION (top-k, fixed-size reports, model-sized
    * tables) — a single-partition sort of a large result would serialize.
    * Thresholded PAIR SETS do NOT qualify: the round-11 full sf1 sweep
    * measured dd_simhash emitting 27.4M pairs on a duplicate-saturated
    * corpus (100× the sf0.1 output) — pairs-emitters are output-bound in
    * the data, so every dd_* pair/per-doc output uses [[largeSort]].
    */
  def smallSort(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  /** Conf escape for [[largeSort]]: when "true" the helper degrades to a
    * plain `orderBy`. Used ONLY by plan-shape specs — the checkpoint hides
    * the query's physical plan behind an RDD scan, and the specs pin
    * pushdown/broadcast/codegen properties of the INNER plan.
    */
  val PlainSortConf = "graft.presentation.plainSort"

  /** Deterministic presentation sort for a LARGE (input-sized) result of a
    * plan that does real work. A bare `orderBy` range-partitions, and
    * RangePartitioner's bounds sampling RE-EXECUTES the child plan — at sf1
    * q15 paid 63.6 s sorted vs 12.1 s sort-free (5×), and the gap grows
    * with data because BOTH executions scale (VERDICT r08 #3). A lazy
    * `localCheckpoint` persists the child's partitions (executor-local
    * MEMORY_AND_DISK blocks) on the first job that touches them — which is
    * the bounds-sampling job — so the sort's shuffle reads the SAME
    * materialization instead of recomputing: total cost = one child
    * execution + one write/read of the OUTPUT, strictly cheaper than
    * running the plan twice whenever the plan does any real work.
    *
    * Scale notes: the sort itself stays a range sort (parallel at any
    * width — unlike [[smallSort]]'s single partition, which would
    * serialize an input-sized result). The checkpoint is DISK_ONLY:
    * a MEMORY_AND_DISK checkpoint of an input-sized result competes with
    * the sort's own execution memory in the unified pool (measured: the
    * 8× scale smoke OOMed inside dd_ppjoin's 10⁷-pair checkpoint+sort
    * when the default level held the pairs on-heap), while disk blocks
    * cost exactly the contract's "one write/read of the OUTPUT" without
    * pressuring anything. Blocks are non-replicated: losing an executor
    * mid-sort fails the job instead of recomputing — acceptable for a
    * presentation tail whose alternative is a guaranteed 2× (on a long
    * pipeline, prefer writing the result to storage and sorting from
    * there, which is this same shape durably).
    */
  def largeSort(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    if (df.sparkSession.conf.getOption(PlainSortConf).contains("true"))
      df.orderBy(cols: _*)
    else df.localCheckpoint(eager = false,
      storageLevel = org.apache.spark.storage.StorageLevel.DISK_ONLY).orderBy(cols: _*)
}
