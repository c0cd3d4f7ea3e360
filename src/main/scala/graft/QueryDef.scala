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
    * to order 990 rows). Scale note: only used where the output is small
    * BY CONSTRUCTION (thresholded pair sets, per-cluster reports, top-k) —
    * a single-partition sort of a large result would serialize; those
    * queries keep the range sort.
    */
  def smallSort(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)
}
