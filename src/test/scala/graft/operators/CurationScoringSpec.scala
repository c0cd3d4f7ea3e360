package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Invariants for the round-9 curation/scoring additions beyond what the
  * DuckDB oracles pin (the oracles prove cross-engine equality; these prove
  * the operators mean what they claim): temperature flattening and budget
  * arithmetic for ta_domain_mix, non-degenerate distillation for
  * ta_classifier_score, and planted-document ranking for ta_bm25.
  */
class CurationScoringSpec extends SparkSuite with Matchers {

  test("ta_domain_mix: temperature flattens (bigger source, lower keep rate), budget respected") {
    val rows = graft.SparkEntry.queries("ta_domain_mix")(spark, sf("sf0.001")).collect()
    rows.length should be > 0
    val bySource = rows.groupBy(_.getString(1)).map { case (src, rs) =>
      val n = rs.head.getLong(2)
      val k = rs.head.getLong(3)
      val kept = rs.count(_.getBoolean(4))
      (src, n, k, kept, rs.length.toLong)
    }.toSeq
    val total = bySource.map(_._2).sum
    val budget = math.ceil(0.5 * total).toLong
    for ((src, n, k, _, nRows) <- bySource) {
      nRows shouldBe n // n_source really is the source's row count
      k should be <= n // never upsample past the source
    }
    // Σ targets ≤ budget, and within one floor-loss per source of it
    // (no source is capped at n on this data — α=0.5 keeps every k < n)
    val sumK = bySource.map(_._3).sum
    sumK should be <= budget
    sumK should be >= budget - bySource.length
    // α = 0.5 flattening: a strictly larger source never gets a strictly
    // larger keep RATE (up to the 1/n quantization of the floor)
    for {
      (_, na, ka, _, _) <- bySource
      (_, nb, kb, _, _) <- bySource
      if na > nb
    } ka.toDouble / na should be <= kb.toDouble / nb + 1.0 / nb
    // the hash-Bernoulli realization tracks the targets
    val kept = bySource.map(_._4).sum
    math.abs(kept - sumK).toDouble should be <= 4 * math.sqrt(budget.toDouble)
  }

  test("ta_classifier_score: distillation is non-degenerate and beats the majority class") {
    val rows = graft.SparkEntry.queries("ta_classifier_score")(spark, sf("sf0.01")).collect()
    val n = rows.length
    n should be > 0
    val preds = rows.map(_.getBoolean(3))
    val labels = rows.map(_.getBoolean(4))
    // the calibrated threshold must actually split the score distribution
    preds.count(identity) should (be > 0 and be < n)
    val majority = math.max(labels.count(identity), n - labels.count(identity)).toDouble / n
    val accuracy = preds.zip(labels).count { case (p, l) => p == l }.toDouble / n
    accuracy should be > majority // hashed unigrams carry signal beyond the prior
    accuracy should be >= 0.7
  }

  test("ta_classifier_score: plan reads the persisted intermediate — corpus exploded once") {
    // The fix for the 4× corpus re-explode (r9 verdict): wb is cached for
    // the model + scoring consumers and `full` is persisted before the tau
    // fetch, so the RETURNED frame must read the in-memory relation, not
    // re-derive the explode from the parquet scan.
    // plain sort so the presentation tail doesn't hide the read behind a
    // localCheckpoint RDD scan
    spark.conf.set(graft.QueryDef.PlainSortConf, "true")
    try {
      val df = graft.SparkEntry.queries("ta_classifier_score")(spark, sf("sf0.001"))
      val lp = df.queryExecution.optimizedPlan
      // every leaf of the RETURNED frame is the persisted intermediate —
      // no parquet re-scan, no re-run of the word explode downstream
      // (pre-fix the plan re-derived both up to 4×)
      val leaves = lp.collectLeaves()
      leaves should not be empty
      all(leaves.map(_.getClass.getSimpleName)) shouldBe "InMemoryRelation"
      lp.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      } shouldBe empty
    } finally spark.conf.unset(graft.QueryDef.PlainSortConf)
  }

  test("ta_bm25: planted ranking — more matched terms and higher tf outrank, non-matches absent") {
    import spark.implicits._
    val filler = Seq.fill(17)("filler").mkString(" ")
    val docs = Seq(
      (1L, s"spark stream join $filler"), // 3 of q_stream's terms, dl 20
      (2L, s"spark filler filler $filler"), // 1 term, same dl
      (3L, s"spark spark spark $filler"), // 1 term, tf 3, same dl
      (4L, "filler " * 20) // no query terms at all
    ).toDF("doc_id", "text")
    val got = TextIndex.bm25(spark, docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.map(_._1).distinct shouldBe Array("q_stream") // only q_stream's terms exist
    val stream = got.filter(_._1 == "q_stream")
    stream.map(_._2) shouldBe Array(1L, 3L, 2L) // all-terms > high-tf > single-hit
    stream.map(_._3) shouldBe Array(3L, 1L, 1L) // n_terms matched
    stream.map(_._4) shouldBe stream.map(_._4).sorted.reverse // score desc
    got.map(_._2) should not contain 4L
  }

  test("ta_ccnet_buckets: per-language quantile split is ordered and roughly 30/40/30") {
    val rows = graft.SparkEntry.queries("ta_ccnet_buckets")(spark, sf("sf0.01")).collect()
      .map(r => (r.getString(1), r.getDouble(3), r.getString(4)))
    rows.length should be > 0
    rows.map(_._3).toSet shouldBe Set("head", "middle", "tail")
    for ((lang, rs) <- rows.groupBy(_._1)) {
      val byBucket = rs.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      // buckets partition the score line: every head score is below every
      // middle score, every middle below every tail (quantile thresholds)
      for {
        hi <- byBucket.get("head").map(_.max)
        lo <- byBucket.get("middle").map(_.min)
      } hi should be <= lo
      for {
        hi <- byBucket.get("middle").map(_.max)
        lo <- byBucket.get("tail").map(_.min)
      } hi should be <= lo
      // the split tracks the 0.3/0.7 quantiles (ties can shift it a little)
      val n = rs.length.toDouble
      if (n >= 50) {
        byBucket.getOrElse("head", Array.empty[Double]).length / n shouldBe 0.30 +- 0.10
        byBucket.getOrElse("tail", Array.empty[Double]).length / n shouldBe 0.30 +- 0.10
      }
    }
  }

  test("ta_weighted_sample: size-biased, deterministic, and planned as a bounded-heap top-k") {
    val df = graft.SparkEntry.queries("ta_weighted_sample")(spark, sf("sf0.01"))
    // global top-k must be the k-row-heap physical op, never a full sort
    df.queryExecution.executedPlan.toString should include("TakeOrderedAndProject")
    val rows = df.collect()
    rows.length shouldBe 100
    // weight ∝ n_chars ⇒ the sample over-represents long documents
    val sampleMean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    val corpusMean = graft.Tables.documents(spark, sf("sf0.01"))
      .filter(org.apache.spark.sql.functions.col("n_chars") > 0)
      .agg(org.apache.spark.sql.functions.avg("n_chars")).collect().head.getDouble(0)
    sampleMean should be > corpusMean
    // pure function of the rows: a second run is bit-identical
    val again = graft.SparkEntry.queries("ta_weighted_sample")(spark, sf("sf0.01")).collect()
    again.map(_.toString) shouldBe rows.map(_.toString)
  }

  test("ta_bigram_lm: predictable text scores lower NLL than shuffled text; floored bigrams back off") {
    import spark.implicits._
    // docs 1-4 repeat the same word order (their bigrams reach the model);
    // doc 5 uses the SAME unigrams in a once-seen order — every one of its
    // bigrams has corpus count 1 < BigramMinCount -> pure unigram backoff
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the mat"),
      (4L, "the cat sat on the mat"),
      (5L, "mat the on cat the sat")).toDF("doc_id", "text")
    val rows = TextAnalysis.bigramLm(spark, docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // modeled docs: every bigram in-model, no backoff
    (1L to 4L).foreach { id =>
      rows(id)._1 shouldBe 5L
      rows(id)._2 shouldBe 0L
    }
    // shuffled doc: every bigram unseen-or-floored -> all backoff
    rows(5L)._1 shouldBe 5L
    rows(5L)._2 shouldBe 5L
    // interpolation makes the modeled word order strictly more likely
    rows(1L)._3 should be < rows(5L)._3
  }
}
