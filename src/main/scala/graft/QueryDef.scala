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
}
