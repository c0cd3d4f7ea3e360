package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Hand-checked semantics for the corpus-indexing operators: posting-list
  * content/cap for the inverted index, and the exact lift arithmetic for
  * collocations (the oracle proves cross-engine equality; these prove the
  * numbers are the ones the definitions promise).
  */
class TextIndexSpec extends SparkSuite with Matchers {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("inverted index: df counts documents (not occurrences), postings sorted") {
    val got = TextIndex.invertedIndex(docs(Seq(
      (3L, "a b a"), // 'a' twice in one doc → df 1 for that doc
      (1L, "b c"),
      (2L, "a"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    got shouldBe Array(
      ("a", 2L, "2,3"),
      ("b", 2L, "1,3"),
      ("c", 1L, "1"))
  }

  test("inverted index: posting head capped at PostingsCap, df stays exact") {
    val many = (1L to 50L).map(i => (i, "hot term"))
    val rows = TextIndex.invertedIndex(docs(many)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    rows.map(_._1).sorted shouldBe Array("hot", "term")
    for ((_, df, head) <- rows) {
      df shouldBe 50L // full document frequency survives the cap
      head shouldBe (1L to TextIndex.PostingsCap).mkString(",")
    }
  }

  test("collocations: exact lift arithmetic and (lift desc, bigram asc) order") {
    // one doc = "x y q" × 25 → bigrams: (x y)×25, (y q)×25, (q x)×24;
    // unigrams all 25; n_tok = 75.
    val text = Seq.fill(25)("x y q").mkString(" ")
    val got = TextIndex.collocations(docs(Seq((1L, text)))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    got shouldBe Array(
      // lift = c_ab * 75 / (25 * 25): 25*75/625 = 3.0, 24*75/625 = 2.88
      ("x y", 25L, 25L, 25L, 3.0),
      ("y q", 25L, 25L, 25L, 3.0),
      ("q x", 24L, 25L, 25L, 2.88))
  }

  test("collocations: pairs under MinPairCount are dropped") {
    val text = Seq.fill(19)("u v").mkString(" ") // "v u" appears 18×, "u v" 19×
    TextIndex.collocations(docs(Seq((1L, text)))).collect() shouldBe empty
  }

  test("bpe merge step: char pairs weighted by word frequency, ties by pair") {
    // "ab" ×3, "abc" ×2 → pairs: ab: 3+2=5, bc: 2. 1-char words contribute
    // nothing.
    val got = TextIndex.bpeMergeStep(docs(Seq(
      (1L, "ab ab abc a"),
      (2L, "ab abc a"))))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    got shouldBe Array(("ab", 5L), ("bc", 2L))
  }

  test("bpe merge step: pair weight is the WORD count, chars inside a word count once per occurrence") {
    // "aaa" ×2 → pairs per occurrence: aa, aa → weight 2 each, summed = 4
    val got = TextIndex.bpeMergeStep(docs(Seq((1L, "aaa aaa"))))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    got shouldBe Array(("aa", 4L))
  }

  test("bpe train: greedy merge application and vocab-level iteration") {
    // vocab: "abab"×3, "ab"×2. Round 1: best pair (a,b) score 3+3+2=8
    // (ba: 3). Applying (a,b) greedily: "abab" → [ab, ab], "ab" → [ab].
    // Round 2: the ONLY remaining pair is (ab, ab) score 3 — pins both the
    // non-overlapping left-to-right merge semantics and that later rounds
    // count MERGED symbols, not characters.
    val got = TextIndex.bpeTrain(spark, docs(Seq(
        (1L, "abab abab ab"),
        (2L, "abab ab"))), 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    got shouldBe Array((1L, "a b", 8L), (2L, "ab ab", 3L))
  }

  test("bpe train: round-1 merge equals the single-step argmax; scores never increase") {
    val dir = sf("sf0.001")
    val step1 = graft.SparkEntry.queries("ta_bpe_merge")(spark, dir)
      .collect().head
    val train = graft.SparkEntry.queries("ta_bpe_train")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // the budget is a ceiling: this corpus' 30-word vocab exhausts its
    // pair supply well before 256 merges, so the early exit must bind
    train.size.toLong should be < TextIndex.BpeRounds.toLong
    train.size.toLong should be >= 50L
    all(train.map(_._3)) should be >= TextIndex.BpeMinPairCount.toLong
    train.head._2 shouldBe step1.getString(0).grouped(1).mkString(" ")
    // a merge can only create pairs bounded by its own count, and existing
    // pairs only lose occurrences — the argmax sequence is non-increasing
    train.map(_._3).toSeq.sliding(2).foreach { case Seq(a, b) => b should be <= a }
  }

  test("plan shape: collocations joins broadcast the vocabulary side") {
    val p = graft.SparkEntry.queries("ta_collocations")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    p should include("BroadcastHashJoin")
    (p should not).include("CartesianProduct")
  }

  test("ta_hybrid_rrf: both-system hits outrank single-system hits; absent ranks are null") {
    import spark.implicits._
    // query doc 7 (a HybridQueryDocs id); 1 matches lexically AND densely,
    // 2 lexically only, 3 densely only, 4 neither
    val d = docs(Seq(
      (7L, "alpha beta gamma"),
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "zeta eta theta"),
      (4L, "zeta eta theta")))
    val emb = Seq(
      (7L, Array(1f, 0f)),
      (1L, Array(1f, 0f)),
      (2L, Array(0f, 1f)),
      (3L, Array(1f, 0f)),
      (4L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val got = TextIndex.hybridRrf(spark, d, emb).collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    got.map(_._1) shouldBe Array(1L, 2L, 3L, 4L) // both > lex+weak-dense > dense-only > neither
    got(0) shouldBe ((1L, 1L, 1L)) // top of both rankings
    got(2)._2 shouldBe -1L // doc 3 shares no query vocabulary → no lexical rank
    // RRF arithmetic: doc 1 scores 2/(60+1) (rank 1 in both systems)
    val top = TextIndex.hybridRrf(spark, d, emb).collect()(0).getLong(4)
    top shouldBe math.round(2.0 / 61 * 1e9)
  }
}
