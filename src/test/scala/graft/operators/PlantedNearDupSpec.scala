package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Planted-near-duplicate specs for the signature-based dedup operators:
  * near-identical documents MUST collide, disjoint documents MUST NOT.
  * (These operators are also DuckDB-oracle-checked end-to-end; this spec
  * pins the collision semantics on adversarially-constructed inputs the
  * testdata may not contain.)
  */
class PlantedNearDupSpec extends SparkSuite with Matchers {

  // 8 filler docs with distinct vocabulary + 2 planted near-dup groups.
  private lazy val docs = {
    import spark.implicits._
    val base =
      "the quick brown fox jumps over the lazy dog while rain falls gently on the quiet village roofs " +
        "and the baker prepares fresh warm bread for the early morning market crowd"
    // One-word append. "softly" is chosen so the pair also lands within
    // SimHash's banding guarantee (hamming ≤ 3 under the deterministic
    // md5-based word hash); SimHash on ~30-word docs flips ~5 bits for an
    // arbitrary one-word change (vote sums near zero), which is expected
    // algorithm behavior, not a bug — MinHash/ngram cover that regime.
    val nearDup = base + " softly"
    val base2 =
      "deep in the mountain mine the old engineer counts copper wagons rolling past the flickering " +
        "lanterns as the night shift hauls ore toward the distant smelter fires burning bright"
    val nearDup2 = base2 + " tonight" // one-word append
    val fillers = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma",
      "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen",
      "crimson harbor lighthouse beams sweep across cold salt water guiding tired fishing boats home safely",
      "the orchestra tunes violins cellos flutes and horns before the conductor raises a silver baton",
      "solar panels convert bright desert sunlight into steady electric current for the valley towns",
      "ancient scrolls describe forgotten trade routes crossing vast steppe grasslands toward jade markets",
      "children build sandcastles near turquoise waves collecting pink shells in woven straw baskets",
      "midnight trains carry heavy freight through foggy junctions toward sprawling river ports")
    (Seq(base, nearDup, base2, nearDup2) ++ fillers).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .cache()
  }

  test("MinHash-LSH finds both planted near-dup pairs and nothing else") {
    val pairs = Dedup.minhashLshPairs(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain(0L -> 1L)
    pairs should contain(2L -> 3L)
    pairs shouldBe Set(0L -> 1L, 2L -> 3L)
  }

  test("MinHash-LSH verified jaccard is high for planted pairs") {
    val j = Dedup.minhashLshPairs(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    j(0L -> 1L) should be > 0.8
    j(2L -> 3L) should be > 0.8
  }

  test("SimHash finds the planted near-dup pairs and no cross-group pair") {
    val pairs = Dedup.simhashPairs(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain(0L -> 1L)
    pairs should contain(2L -> 3L)
    // no pair across the two planted groups, no filler pair
    pairs.intersect(Set(0L -> 2L, 0L -> 3L, 1L -> 2L, 1L -> 3L)) shouldBe empty
    all(pairs.toSeq.map(p => p._1 / 2 == p._2 / 2)) shouldBe true
  }

  test("imperative SimHashAgg equals the composable 64-column formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val words = docs
      .select($"doc_id", explode(graft.functions.Exprs.words(
        graft.functions.Exprs.normText($"text"))).as("word"))
      .distinct()
      .select($"doc_id", xxhash64($"word").as("h"))
    val fast = words.groupBy($"doc_id")
      .agg(graft.functions.SimHashAgg($"h").as("sig"))
    val bitVotes = (0 until 64).map { j =>
      sum(when($"h".bitwiseAND(lit(1L << j)) =!= 0, 1).otherwise(-1)).as(s"b$j")
    }
    val sigExpr = (0 until 64)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) => a.bitwiseOR(b))
    val slow = words.groupBy($"doc_id").agg(bitVotes.head, bitVotes.tail: _*)
      .select($"doc_id", sigExpr.as("sig"))
    fast.except(slow).count() shouldBe 0
    slow.except(fast).count() shouldBe 0
  }

  test("exact-dedup fingerprint groups case/spacing variants of one text") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = Seq(
      (1L, "Exact Same   Content here"),
      (2L, "exact same content HERE"),
      (3L, "different content entirely")).toDF("doc_id", "text")
    val groups = d.groupBy(graft.functions.Exprs.fingerprint($"text").as("fp"))
      .agg(count(lit(1)).as("n"), min($"doc_id").as("keep"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    groups shouldBe Set((2L, 1L), (1L, 3L))
  }
}
