package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins the winnowing guarantee: documents sharing a long token run share
  * fingerprints; vocabulary-disjoint documents share none; and the selected
  * density is ≈ 2/(w+1) of shingle positions, not the full stream.
  */
class WinnowingSpec extends SparkSuite with Matchers {

  private lazy val docs = {
    import spark.implicits._
    val shared = "the silver river bends past the old mill where miners once washed gravel for gold"
    Seq(
      (0L, s"intro words before anything $shared and some trailing words here"),
      (1L, s"$shared with a completely different ending about modern tourists"),
      (2L, "vocabulary entirely disjoint sentence mentioning quantum processors and orbital telescopes today"))
      .toDF("doc_id", "text")
  }

  test("shared token run ⇒ shared fingerprints; disjoint docs ⇒ none") {
    val fps = Dedup.winnowFingerprints(spark, docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    fps(0L).intersect(fps(1L)).size should be >= 2 // guarantee: run ≥ w+2 tokens
    fps(0L).intersect(fps(2L)) shouldBe empty
    fps(1L).intersect(fps(2L)) shouldBe empty
  }

  test("density: fingerprints per doc ≪ shingle positions (~2/(w+1))") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val nShingles = docs
      .select($"doc_id", graft.functions.Exprs.shingles(
        graft.functions.Exprs.words(graft.functions.Exprs.normText($"text")), 3).as("s"))
      .select($"doc_id", org.apache.spark.sql.functions.size($"s").as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fpCounts = Dedup.winnowFingerprints(spark, docs).groupBy($"doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, n) <- nShingles) {
      fpCounts(id).toDouble should be < (n.toDouble * 0.8) // strictly sparser
      fpCounts(id) should be >= 1L
    }
  }
}
