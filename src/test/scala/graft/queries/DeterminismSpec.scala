package graft.queries

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins SCALING.md's "deterministic results under any partitioning" claim:
  * the queries whose results depend on sums, hashes, windows and iterative
  * joins must produce IDENTICAL rows at different shuffle widths (different
  * partition counts ⇒ different accumulation orders ⇒ any float
  * accumulation or unstable tie-break would flip values here — decimal sums
  * and total-order sorts are why it doesn't).
  */
class DeterminismSpec extends SparkSuite with Matchers {

  private val dir = sf("sf0.001")

  private val sensitive = Seq(
    "q01_pricing_summary", // decimal money sums
    "q20_sketch_stats",    // sketches + cross-joined exact companions
    "dd_minhash_lsh",      // md5-derived hash family
    "dd_span_dup",         // count-over-window document frequency
    "ta_langid",           // integer NLL sums over an exploded join
    "ta_seq_pack",         // per-shard cumulative windows
    "ta_pipeline_e2e",     // the whole composed pipeline
    "sim_kmeans_step",     // decimal centroid means
    // round-10 session-3 additions
    "ev_cdc_apply",        // max_by merge on a unique seq
    "q43_kll_quantiles",   // randomized sketch behind deterministic gates
    "dd_containment",      // df-ordered prefix + hash join
    "sim_kmeans_train",    // 3 iterated integer Lloyd rounds
    "ta_domain_mix",       // the integer-quantized Σ√n normalizer (the
                           // float form was caught varying — see Sampling)
    "ta_shard_shuffle",    // order-sensitive permutation checksum
    // round-11 additions
    "dd_url_dedup",        // two windows whose tie-breaks must be total
    "ta_logreg_train",     // integer gradient sums across partitions
    "ta_logreg_score",     // trained weights + per-doc integer scoring
    "ev_late_audit",       // chunk-series running-max watermark + joins
    "ev_late_backfill",    // decimal merge + equality gates across joins
    "ev_late_sweep",       // delay fan-out over the chunk watermark
    "sim_recall_eval",     // composes two ranked retrievals + a join
    "ev_pit_join",         // sorted-union carry with a total tie-break
    "sim_ivf_incr")        // frozen-quantizer assignment + appended lists

  test("hash-sensitive queries are identical at shuffle widths 3 and 8") {
    val conf = spark.conf
    for (name <- sensitive) withClue(s"$name: ") {
      val q = graft.SparkEntry.queries(name)
      conf.set("spark.sql.shuffle.partitions", "8")
      val wide = q(spark, dir).collect().map(_.toString).toSeq
      conf.set("spark.sql.shuffle.partitions", "3")
      val narrow = try q(spark, dir).collect().map(_.toString).toSeq
      finally conf.set("spark.sql.shuffle.partitions", "8")
      narrow shouldBe wide
    }
  }
}
