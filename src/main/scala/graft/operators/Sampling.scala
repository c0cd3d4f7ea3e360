package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.QueryDef.sqlChecked
import graft.functions.Exprs

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
  *  - `ta_domain_mix`: temperature-based source reweighting (the Pile /
  *    DoReMi-style domain mixing step): target share per source
  *    ∝ count^α (α = 0.5), realized as a per-source Bernoulli keep rate
  *    decided by content hash — no per-source ranking window, so no
  *    skew-prone per-source global order.
  *
  * Scale: all are per-row expression work — no shuffle on the corpus, no
  * coordination; the split is exactly as parallel as the scan
  * (ta_domain_mix adds one source-count aggregate whose result is
  * source-cardinality-sized and broadcasts back).
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

    // Deterministic GLOBAL SHUFFLE + range sharding — the last stage before
    // training: every doc gets a content-hash shuffle key, shard =
    // hash-range bucket (h div 2^57 → 8 shards), within-shard order = hash
    // order. At 100 TB this is ONE repartitionByRange(h) +
    // sortWithinPartitions + write — a single shuffle produces balanced
    // shards in a reproducible pseudo-random order (an RNG shuffle changes
    // under repartitioning and can never be re-verified; the hash order is
    // a pure function of the data). The query pins the whole permutation:
    // per-shard counts, char totals, AND an order-sensitive checksum
    // Σ pos·(h mod 1000003) that any reordering breaks. Oracle replays
    // hash, sharding, order and checksum from md5 alone.
    sqlChecked(
      "ta_shard_shuffle",
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    CAST(('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |s AS (SELECT *, h // 144115188075855872 AS shard FROM h),
        |p AS (SELECT *, row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos FROM s)
        |SELECT CAST(shard AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(20,8))) AS DOUBLE) AS total_chars,
        |  CAST(SUM(pos * (h % 1000003)) AS BIGINT) AS order_checksum
        |FROM p GROUP BY shard ORDER BY shard""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"shard").orderBy($"h", $"doc_id")
      Tables.documents(s, dir)
        .select($"doc_id", $"n_chars",
          graft.functions.Exprs.hash60(concat(lit("shuf:"), $"doc_id".cast("string"))).as("h"))
        .withColumn("shard", expr(s"h div ${1L << 57}"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars".cast("decimal(20,8)")).cast("double").as("total_chars"),
          sum($"pos" * ($"h" % 1000003)).as("order_checksum"))
        .orderBy($"shard")
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
    },

    // Temperature-based domain mixing (Gao et al. 2020 "The Pile" §2 /
    // DoReMi-style source reweighting): resample each source toward a
    // share ∝ n^α (α = 0.5) of a budget of half the corpus. The target
    // count per source k = min(n, ⌊n^α/Σn^α · ⌈N/2⌉⌋) becomes a Bernoulli
    // keep RATE k/n decided by content hash — same statistics as
    // rank-then-cut, but with no per-source ordering window (a hot source
    // would serialize one) and stable under repartitioning. The normalizer
    // z = Σ√n is summed as INTEGER micro-units (√n rounded ×1e6 per
    // source, then an exact integer sum): a float Σ√n is summation-ORDER-
    // dependent, and DuckDB's parallel aggregation reorders it run to run
    // — observed flipping a boundary doc's keep decision once in ~15 runs
    // at sf0.1 (round-10 session 3) before this quantization. Every
    // remaining double op is a deterministic scalar chain on identical
    // inputs, quantized to an integer threshold before the comparison, so
    // the decision is bit-identical across engines AND thread counts.
    // Scale: the source-count aggregate is source-cardinality-sized and
    // broadcasts back; the corpus itself never shuffles.
    sqlChecked(
      "ta_domain_mix",
      """WITH s AS (SELECT source, COUNT(*) AS n,
        |             CAST(round(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000) AS BIGINT) AS rn
        |           FROM documents GROUP BY source),
        |tot AS (SELECT SUM(rn) AS z, SUM(n) AS total FROM s),
        |r AS (SELECT source, n,
        |        least(n, CAST(floor(CAST(rn AS DOUBLE) / z * ceil(0.5 * total)) AS BIGINT)) AS k
        |      FROM s CROSS JOIN tot)
        |SELECT d.doc_id, d.source, r.n AS n_source, r.k AS k_target,
        |  ((CAST(('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)),1,8)) AS BIGINT) % 1000000)
        |   < CAST(floor(CAST(r.k AS DOUBLE) / r.n * 1000000) AS BIGINT)) AS keep
        |FROM documents d JOIN r USING (source)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val counts = docs.groupBy($"source").agg(count(lit(1)).as("n"))
        .withColumn("rn", round(sqrt($"n".cast("double")) * 1e6).cast("long"))
      val tot = counts.agg(sum($"rn").as("z"), sum($"n").as("total"))
      val rates = counts.crossJoin(broadcast(tot))
        .select($"source", $"n",
          least($"n", floor($"rn".cast("double") / $"z" * ceil(lit(0.5) * $"total")))
            .as("k"))
      val u = conv(substring(md5(concat(lit("mix:"), $"doc_id".cast("string"))), 1, 8), 16, 10)
        .cast("long") % 1000000
      docs.join(broadcast(rates), Seq("source"))
        .select($"doc_id", $"source", $"n".as("n_source"), $"k".as("k_target"),
          (u < floor($"k".cast("double") / $"n" * 1000000)).as("keep"))
        .transform(d => graft.QueryDef.largeSort(d, $"doc_id"))
    },

    // Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    // A-Res): each row gets key = ln(u)/w for u ∈ (0,1), w = its weight
    // (here n_chars — sample documents proportional to size); the k
    // largest keys are exactly a weighted sample without replacement.
    // u comes from a CONTENT HASH, not an RNG (the ta_hash_split
    // discipline): the sample is a pure function of the rows — stable
    // across runs, engines, and partitionings, hence fully oracle-checked.
    // Keys are quantized to integer nano-keys before ranking, with doc_id
    // as the total tie-break, so the ranking is deterministic.
    // Scale: one expression pass + a global top-k, which Spark plans as
    // TakeOrderedAndProject — a bounded k-row heap per task and a k-row
    // driver merge; no corpus shuffle, no global sort.
    // Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
    // arXiv:2302.03169): select raw documents whose hashed-n-gram profile
    // resembles a TARGET distribution (here the corpus' English slice — in
    // production, a curated high-quality set). Both distributions are
    // bag-of-hashed-features multinomials over 1024 buckets (unigrams +
    // bigrams, Laplace-smoothed); a doc's log importance weight is
    //   log ŵ = Σ_features [log p̂_target(b) − log q̂_raw(b)],
    // and resampling WITHOUT replacement is Gumbel top-k over
    // log ŵ + G, with G = −ln(−ln u) and u a CONTENT hash (the
    // ta_weighted_sample discipline — the paper's RNG replaced by a pure
    // function of the row, so the sample is reproducible and fully
    // oracle-checked). Per-bucket log ratios are quantized to integer
    // micro-units at the MODEL (1024 rows), so per-doc weights are exact
    // integer sums — order-independent, bit-identical across engines and
    // partitionings (the ta_classifier_score discipline).
    // Scale: the feature explode is per-row expression work; the model is
    // ONE bucket-keyed aggregate collapsing to 1024 rows that broadcast
    // back; the corpus shuffles only (doc_id, lam_micro) pairs for the
    // per-doc rollup; selection is a global top-k planned as
    // TakeOrderedAndProject (bounded k-row heap per task, k-row driver
    // merge — no global sort). DsirSpec pins that planted target-like
    // docs outrank off-distribution docs and win selection.
    sqlChecked(
      "ta_dsir",
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g')), '\s+'),
        |                w -> w <> '') AS toks
        |  FROM documents),
        |fb AS (
        |  SELECT doc_id, lang = 'en' AS tgt,
        |    CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT) % 1024 AS bucket
        |  FROM (SELECT doc_id, lang,
        |          unnest(list_concat(toks,
        |            list_transform(generate_series(1, len(toks) - 1),
        |                           i -> toks[i] || ' ' || toks[i + 1]))) AS f
        |        FROM toks)),
        |m AS (SELECT bucket,
        |        SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS tc,
        |        COUNT(*) AS rc
        |      FROM fb GROUP BY bucket),
        |tot AS (SELECT SUM(tc) AS t, SUM(rc) AS r FROM m),
        |lam AS (SELECT bucket,
        |          CAST(round((ln((tc + 1.0) / (t + 1024.0))
        |                    - ln((rc + 1.0) / (r + 1024.0))) * 1000000) AS BIGINT) AS lam_micro
        |        FROM m CROSS JOIN tot),
        |logw AS (SELECT doc_id, CAST(SUM(lam_micro) AS BIGINT) AS logw_micro
        |         FROM fb JOIN lam USING (bucket) GROUP BY doc_id)
        |SELECT d.doc_id, d.lang,
        |  COALESCE(logw_micro, 0) AS logw_micro,
        |  CAST(round(-ln(-ln((CAST(('0x' || substr(md5('dsir:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 + 0.5) / 1000000.0)) * 1000000) AS BIGINT) AS gumbel_micro,
        |  COALESCE(logw_micro, 0)
        |    + CAST(round(-ln(-ln((CAST(('0x' || substr(md5('dsir:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 + 0.5) / 1000000.0)) * 1000000) AS BIGINT) AS key_micro
        |FROM documents d LEFT JOIN logw ON d.doc_id = logw.doc_id
        |ORDER BY key_micro DESC, d.doc_id LIMIT 100""".stripMargin) { (s, dir) =>
      dsir(s, Tables.documents(s, dir), "en", 100)
    },

    sqlChecked(
      "ta_weighted_sample",
      """SELECT doc_id, n_chars,
        |  CAST(round(ln((CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 1000000 + 0.5) / 1000000.0)
        |             / n_chars * 1000000000) AS BIGINT) AS key_nano
        |FROM documents WHERE n_chars > 0
        |ORDER BY key_nano DESC, doc_id LIMIT 100""".stripMargin) { (s, dir) =>
      import s.implicits._
      val u = (conv(substring(md5(concat(lit("ws:"), $"doc_id".cast("string"))), 1, 8), 16, 10)
        .cast("long") % 1000000 + 0.5) / 1000000.0
      Tables.documents(s, dir)
        .filter($"n_chars" > 0)
        .select($"doc_id", $"n_chars",
          round(log(u) / $"n_chars" * 1000000000L).cast("long").as("key_nano"))
        .orderBy($"key_nano".desc, $"doc_id")
        .limit(100)
    }
  )

  /** DSIR core (see the ta_dsir comment) — exposed for DsirSpec. `docs`
    * needs (doc_id, lang, text); `targetLang` defines the target slice.
    */
  def dsir(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      targetLang: String, k: Int): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val toks = Exprs.normWords($"text")
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit(" "), b))
    // the feature explode feeds TWO consumers (model aggregate + scoring
    // join) — cache it once, the ta_classifier_score lesson; rows are
    // (doc_id, bool, bucket), never text
    val fb = docs
      .select($"doc_id", ($"lang" === targetLang).as("tgt"),
        explode(concat(toks, bigrams)).as("f"))
      .withColumn("bucket",
        conv(substring(md5($"f"), 1, 8), 16, 10).cast("long") % 1024)
      .drop("f")
      .cache()
    val m = fb.groupBy($"bucket").agg(
      sum(when($"tgt", 1L).otherwise(0L)).as("tc"),
      count(lit(1)).as("rc"))
    // feature totals: a 2-scalar model-sized driver fetch (the documented
    // k-means/classifier pattern — never corpus-sized)
    val totRow = m.agg(sum($"tc"), sum($"rc")).collect().head
    val (t, r) = (totRow.getLong(0), totRow.getLong(1))
    val lam = m.select($"bucket",
      round((log(($"tc" + 1.0) / (t + 1024.0)) - log(($"rc" + 1.0) / (r + 1024.0))) * 1e6)
        .cast("long").as("lam_micro"))
    val logw = fb.join(broadcast(lam), Seq("bucket"))
      .groupBy($"doc_id").agg(sum($"lam_micro").as("logw_micro"))
    val u = (conv(substring(md5(concat(lit("dsir:"), $"doc_id".cast("string"))), 1, 8), 16, 10)
      .cast("long") % 1000000 + 0.5) / 1000000.0
    docs.select($"doc_id", $"lang")
      .join(logw, Seq("doc_id"), "left")
      .select($"doc_id", $"lang",
        coalesce($"logw_micro", lit(0L)).as("logw_micro"),
        round(-log(-log(u)) * 1e6).cast("long").as("gumbel_micro"))
      .withColumn("key_micro", $"logw_micro" + $"gumbel_micro")
      .orderBy($"key_micro".desc, $"doc_id")
      .limit(k)
  }
}
