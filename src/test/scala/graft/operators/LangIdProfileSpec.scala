package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Staleness gate for the committed langid model: rebuilding the profile
  * from the embedded training corpora must reproduce
  * fixtures/langid/profile.parquet exactly. Guards against editing the
  * corpora (or the weight formula) without regenerating the fixture — the
  * query and its oracle both read the committed file, so they would still
  * agree with each other while silently scoring with a stale model.
  */
class LangIdProfileSpec extends SparkSuite with Matchers {

  test("committed trigram profile matches a fresh rebuild from the corpora") {
    val rebuilt = LangIdProfileGen.buildProfile()
      .map { case (t, en, fr, de, es) => (t, en, fr, de, es) }.toSet
    val committed = spark.read
      .parquet(graft.Fixtures.dir("langid", "GRAFT_LANGID_DIR") + "/profile.parquet")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    committed shouldBe rebuilt
  }
}
