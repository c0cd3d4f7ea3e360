package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for the perceptual-hash image near-dup bridge (mm_phash /
  * mm_phash_dedup, additionally full-replay oracle-checked): every planted
  * variant (ph_1000+k = base 3k with a perturbed corner) must surface as a
  * pair within the Hamming threshold, the hash must not be degenerate, and
  * the candidate stage must be a banded equi-join, not an all-pairs plan.
  */
class PhashSpec extends SparkSuite with Matchers {

  test("every planted near-dup variant pairs with its base within the threshold") {
    val rows = graft.SparkEntry.queries("mm_phash_dedup")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = rows.map(t => (t._1, t._2)).toSet
    for (k <- 0 until MediaFixtureGen.PhashVariants) {
      val base = MediaFixtureGen.phashVariantBase(k).toLong
      withClue(s"variant ${1000 + k} vs base $base: ")(
        pairs should contain(base, 1000L + k))
    }
    all(rows.map(_._3)) should be <= 3L // the verify stage enforces the bound
  }

  test("the base hashes are near-distinct (hash is not degenerate)") {
    val hashes = graft.SparkEntry.queries("mm_phash")(spark, sf("sf0.001"))
      .collect().filter(_.getLong(0) < 1000)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    hashes.length shouldBe MediaFixtureGen.PhashBases
    // bases 9 and 23 are genuine dHash twins (the formula corpus' gradients
    // coincide at the 9×8 grid — they surface as a dist-0 pair in
    // mm_phash_dedup); everything else must be distinct
    hashes.distinct.length shouldBe hashes.length - 1
  }

  test("candidate generation is a banded equi-join — no cartesian product") {
    val p = graft.SparkEntry.queries("mm_phash_dedup")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    (p should not).include("CartesianProduct")
    (p should not).include("BroadcastNestedLoopJoin")
  }
}
