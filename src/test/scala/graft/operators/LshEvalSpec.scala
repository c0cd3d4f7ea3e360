package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.{SparkSuite, Tables}

/** Pins for the LSH candidate-stage eval: exact copies MUST collide in
  * every band (recall and precision both 1.0 — identical shingle sets
  * give identical signatures), near-miss pairs below the threshold are
  * counted in neither set, and the subset identities (verified ≤ cand,
  * verified ≤ true) hold on real data by construction.
  */
class LshEvalSpec extends SparkSuite with Matchers {

  private def doc(seed: Int): String =
    (0 until 40).map(i => s"w${(seed * 13 + i * 7) % 97}x$i").mkString(" ")

  test("exact-copy corpus: every true pair collides and verifies") {
    import spark.implicits._
    // 3 distinct documents x 4 exact copies = 3 * C(4,2) = 18 true pairs;
    // distinct docs share no shingles (token streams are disjoint by seed)
    val docs = (for {
      d <- 0 until 3; c <- 0 until 4
    } yield ((d * 10 + c).toLong, doc(d * 1000 + 1))).toDF("doc_id", "text")
    val r = Dedup.lshCandidateEval(spark, docs).collect().head
    r.getLong(0) shouldBe 18 // n_true
    r.getLong(1) shouldBe 18 // n_cand: identical signatures, nothing else
    r.getLong(2) shouldBe 18 // n_verified
    r.getLong(3) shouldBe 18 // n_hit == n_verified at stride 1
    r.getDouble(4) shouldBe 1.0
    r.getDouble(5) shouldBe 1.0
  }

  test("subset identities on real data") {
    val r = Dedup.lshCandidateEval(
      spark, Tables.documents(spark, sf("sf0.001"))).collect().head
    val (nTrue, nCand, nVer, nHit) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    nVer should be <= nCand
    nVer should be <= nTrue
    nHit shouldBe nVer // stride 1: the stratum is the whole corpus
    r.getDouble(5) shouldBe
      BigDecimal(nVer.toDouble / nTrue).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
  }
}
