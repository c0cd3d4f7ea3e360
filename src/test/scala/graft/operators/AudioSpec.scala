package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for the audio modality (mm_audio_decode / fingerprint / dedup, all
  * additionally oracle-checked from the raw WAV bytes): real decode
  * geometry, planted near-dup detection spanning the full threshold range,
  * fingerprint non-degeneracy, and the banded (no-cartesian) plan.
  */
class AudioSpec extends SparkSuite with Matchers {

  test("decode returns the written geometry: 8 kHz, n = 2000 + 256·doc") {
    val rows = graft.SparkEntry.queries("mm_audio_decode")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.length shouldBe MediaFixtureGen.AudioBases + MediaFixtureGen.AudioVariants
    all(rows.map(_._3)) shouldBe 8000L
    for ((doc, n, _) <- rows) {
      val base = if (doc >= 1000) MediaFixtureGen.audioVariantBase((doc - 1000).toInt)
                 else doc.toInt
      n shouldBe MediaFixtureGen.audioLen(base).toLong
    }
  }

  test("every planted variant pairs with its base; distances span 0..3 incl. the boundary") {
    val rows = graft.SparkEntry.queries("mm_audio_dedup")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = rows.map(t => (t._1, t._2)).toMap
    for (k <- 0 until MediaFixtureGen.AudioVariants) {
      val base = MediaFixtureGen.audioVariantBase(k).toLong
      withClue(s"variant ${1000 + k} vs base $base: ")(
        pairs.keySet should contain(base))
      pairs(base) shouldBe (1000L + k)
    }
    all(rows.map(_._3)) should be <= 3L
    rows.map(_._3).max shouldBe 3L // the threshold boundary is exercised
  }

  test("the 12 base fingerprints are pairwise distinct; candidate join is banded") {
    val fp = graft.SparkEntry.queries("mm_audio_fingerprint")(spark, sf("sf0.001"))
      .collect().filter(_.getLong(0) < 1000)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    fp.length shouldBe MediaFixtureGen.AudioBases
    fp.distinct.length shouldBe fp.length
    val p = graft.SparkEntry.queries("mm_audio_dedup")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    (p should not).include("CartesianProduct")
    (p should not).include("BroadcastNestedLoopJoin")
  }
}
