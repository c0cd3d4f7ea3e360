package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 (and the LLM-pipeline extensions) is a
  * [[QueryDef]]: a Spark implementation plus, where SQL-expressible, a DuckDB
  * oracle over the same parquet tables. Modules register their defs here.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    graft.queries.Relational.defs ++
      freshkart.FreshKartQueries.defs ++
      operators.TextAnalysis.defs ++
      operators.TextIndex.defs ++
      operators.Formats.defs ++
      operators.Sampling.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.GraphAnn.defs ++
      operators.Multimodal.defs ++
      operators.Graph.defs ++
      operators.SkewJoin.defs ++
      operators.Layout.defs ++
      operators.UrlCuration.defs ++
      operators.HtmlExtract.defs ++
      operators.Training.defs ++
      streaming.Events.defs ++
      streaming.EventAnalytics.defs

  /** Flagship: the FreshKart daily_city_sales pipeline end-to-end (reads its
    * committed fixtures; the sfDir argument is unused by fk queries).
    * Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    freshkart.FreshKartQueries.defs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (hash-seeded MinHash/SimHash/LSH) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
