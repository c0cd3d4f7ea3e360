package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** DSIR importance resampling (ta_dsir): on a planted corpus where the
  * target slice has a distinctive vocabulary, raw docs sharing that
  * vocabulary must outweigh off-distribution docs and win the Gumbel
  * top-k — the selection property the operator exists for.
  */
class DsirSpec extends SparkSuite with Matchers {
  import org.apache.spark.sql.functions._

  // target (lang=en): coherent English-ish vocabulary, repeated phrases;
  // raw pool: half share that vocabulary ("good"), half are junk strings.
  private def corpus = {
    import spark.implicits._
    val targetVocab = "the quick brown fox jumps over the lazy dog and runs home"
    val junkVocab = "zzq xkcd qwerty asdf zxcv uiop hjkl bnm qaz wsx edc rfv"
    val target = (0 until 40).map(i => (i.toLong, "en", s"$targetVocab $targetVocab trial $i"))
    val good = (100 until 120).map(i => (i.toLong, "xx", s"$targetVocab again $targetVocab round $i"))
    val junk = (200 until 220).map(i => (i.toLong, "xx", s"$junkVocab shard $i $junkVocab"))
    (target ++ good ++ junk).toDF("doc_id", "lang", "text")
  }

  test("target-like raw docs outweigh junk docs and dominate selection") {
    // k = corpus size → the full Gumbel ranking; the top-k prefix for any
    // smaller k is its prefix. The target slice itself tops the ranking
    // (it IS the distribution being matched) — the operator's value is in
    // how it orders the RAW pool behind it.
    val ranked = Sampling.dsir(spark, corpus, "en", 80).collect()
    ranked should have length 80
    val byId = ranked.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val goodW = (100L until 120L).map(byId)
    val junkW = (200L until 220L).map(byId)
    withClue(s"good weights $goodW vs junk $junkW") {
      // every target-like doc outweighs every junk doc (absolute sign is a
      // normalization artifact — the RANKING is the operator's contract)
      goodW.min should be > junkW.max
    }
    // a k=55 selection (the 40 targets + 15 raw winners) admits no junk
    val top55 = ranked.take(55).map(_.getLong(0))
    val goodSelected = top55.count(id => id >= 100 && id < 120)
    val junkSelected = top55.count(_ >= 200)
    withClue(s"top-55 good=$goodSelected junk=$junkSelected") {
      goodSelected should be >= 10
      junkSelected shouldBe 0
    }
  }

  test("selection is a pure function of the rows (repartition-invariant)") {
    val a = Sampling.dsir(spark, corpus, "en", 30).collect().map(_.toSeq)
    val b = Sampling.dsir(spark, corpus.repartition(7), "en", 30).collect().map(_.toSeq)
    a should contain theSameElementsInOrderAs b
  }
}
