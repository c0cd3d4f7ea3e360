package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.{SparkSuite, Tables}

/** Pins for the SAMPLED exact-truth mode of dd_lsh_eval (r12 verdict #1:
  * the sf1 sweep's 811 s truth side now runs on the doc_id % 4 stratum
  * above ExactPairsDocCap). Two properties make the sample sound:
  *
  *  1. AGREEMENT — the stride-4 recall estimate at sf0.1 must agree with
  *     the full-truth recall (the ann-benchmarks sampled-recall premise:
  *     band collisions are per-pair events independent of the rest of the
  *     corpus, so a deterministic stratum is an unbiased recall sample);
  *  2. GATE — exactPairsDocs is the identity at both driver correctness
  *     scales (≤ 10 000 docs) and the exact doc_id % 4 stratum above, so
  *     the hash-checked sf0.01/sf0.1 surface is untouched by the cap.
  */
class LshEvalSampleSpec extends SparkSuite with Matchers {

  test("stride-4 sampled recall agrees with full-truth recall at sf0.1") {
    val docs = Tables.documents(spark, sf("sf0.1"))
    val full = Dedup.lshCandidateEval(spark, docs).collect().head
    val samp = Dedup.lshCandidateEval(spark, docs, truthStride = 4)
      .collect().head
    // candidate/verified sides are stride-independent (full-corpus both ways)
    samp.getLong(1) shouldBe full.getLong(1) // n_cand
    samp.getLong(2) shouldBe full.getLong(2) // n_verified
    // the sampled truth is a genuine subset, not a degenerate empty one
    samp.getLong(0) should be > 0L
    samp.getLong(0) should be < full.getLong(0)
    // the estimate: within 5pp of the full-truth recall
    math.abs(samp.getDouble(5) - full.getDouble(5)) should be <= 0.05
  }

  test("exactPairsDocs is the identity under the cap, the stratum above") {
    import spark.implicits._
    val small = Tables.documents(spark, sf("sf0.1"))
    Dedup.exactPairsDocs(spark, small).count() shouldBe small.count()
    val big = spark.range(0, 20000).toDF("doc_id")
    val gated = Dedup.exactPairsDocs(spark, big)
    gated.count() shouldBe 5000L
    gated.filter($"doc_id" % Dedup.ExactPairsStride =!= 0).count() shouldBe 0L
  }
}
