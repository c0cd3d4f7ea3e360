package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.QueryDef.{rowsOnly, sqlChecked}

/** Sampling and splitting for training-data curation.
  *
  *  - `ta_hash_split`: REPRODUCIBLE train/valid/test assignment by content
  *    hash (first 8 hex digits of md5(doc_id) mod 100 → 90/5/5). Unlike
  *    `rand()`-based splits, the assignment is a pure function of the row —
  *    stable across runs, engines, partitionings, and re-ingestions, which
  *    is what makes downstream eval honest. md5 is identical in every
  *    engine, so the split is fully oracle-checked.
  *  - `ta_stratified_sample`: per-stratum Bernoulli sampling via
  *    `sampleBy` (seeded). The RNG is Spark-specific → rows-only for the
  *    driver; StratifiedSampleSpec pins per-stratum proportions.
  *
  * Scale: both are per-row expression work — no shuffle, no coordination;
  * the split is exactly as parallel as the scan.
  */
object Sampling {

  val defs: Seq[QueryDef] = Seq(

    sqlChecked(
      "ta_hash_split",
      """SELECT split, COUNT(*) AS n_docs, CAST(SUM(CAST(n_chars AS DECIMAL(20,8))) AS DOUBLE) AS total_chars
        |FROM (
        |  SELECT CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'valid' ELSE 'test' END AS split,
        |         n_chars
        |  FROM (SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket,
        |               n_chars
        |        FROM documents))
        |GROUP BY split ORDER BY split""".stripMargin) { (s, dir) =>
      import s.implicits._
      val bucket = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
      Tables.documents(s, dir)
        .select(
          when(bucket < 90, "train").when(bucket < 95, "valid").otherwise("test")
            .as("split"),
          $"n_chars")
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars".cast("decimal(20,8)")).cast("double").as("total_chars"))
        .orderBy($"split")
    },

    rowsOnly("ta_stratified_sample") { (s, dir) =>
      import s.implicits._
      val fractions = Map("en" -> 0.5, "fr" -> 1.0, "de" -> 1.0, "es" -> 1.0, "zh" -> 0.25)
      Tables.documents(s, dir)
        .stat.sampleBy("lang", fractions, 42L)
        .groupBy($"lang").agg(count(lit(1)).as("n_sampled"))
        .orderBy($"lang")
    }
  )
}
