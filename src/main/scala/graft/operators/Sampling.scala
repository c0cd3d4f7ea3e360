package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.QueryDef.sqlChecked

/** Sampling and splitting for training-data curation.
  *
  *  - `ta_hash_split`: REPRODUCIBLE train/valid/test assignment by content
  *    hash (first 8 hex digits of md5(doc_id) mod 100 → 90/5/5). Unlike
  *    `rand()`-based splits, the assignment is a pure function of the row —
  *    stable across runs, engines, partitionings, and re-ingestions, which
  *    is what makes downstream eval honest. md5 is identical in every
  *    engine, so the split is fully oracle-checked.
  *  - `ta_stratified_sample`: per-stratum Bernoulli sampling decided by a
  *    CONTENT HASH instead of an RNG — row kept iff
  *    `hash60("strat:" + doc_id) mod 10000 < stratum_fraction × 10000`.
  *    Same Bernoulli statistics as a seeded `sampleBy`, but the decision is
  *    a pure function of the row: stable across runs, engines,
  *    partitionings, and re-ingestions (an RNG-based sample changes under
  *    repartitioning), and therefore fully oracle-checked in DuckDB.
  *    StratifiedSampleSpec additionally pins per-stratum proportions.
  *
  * Scale: both are per-row expression work — no shuffle, no coordination;
  * the split is exactly as parallel as the scan.
  */
object Sampling {

  /** (lang → keep-threshold out of 10000) for ta_stratified_sample. */
  val StratFractions: Seq[(String, Int)] =
    Seq("de" -> 10000, "en" -> 5000, "es" -> 10000, "fr" -> 10000, "zh" -> 2500)

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

    sqlChecked(
      "ta_stratified_sample", {
        val thresholds = StratFractions
          .map { case (l, t) => s"WHEN '$l' THEN $t" }.mkString(" ")
        s"""SELECT lang, COUNT(*) AS n_sampled FROM documents
           |WHERE (CAST(('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 10000)
           |      < CASE lang $thresholds ELSE 0 END
           |GROUP BY lang ORDER BY lang""".stripMargin
      }) { (s, dir) =>
      import s.implicits._
      val u = conv(substring(md5(concat(lit("strat:"), $"doc_id".cast("string"))), 1, 8), 16, 10)
        .cast("long") % 10000
      val threshold = StratFractions.foldLeft(lit(0)) { case (acc, (l, t)) =>
        when($"lang" === l, t).otherwise(acc)
      }
      Tables.documents(s, dir)
        .filter(u < threshold)
        .groupBy($"lang").agg(count(lit(1)).as("n_sampled"))
        .transform(d => graft.QueryDef.smallSort(d, $"lang"))
    }
  )
}
