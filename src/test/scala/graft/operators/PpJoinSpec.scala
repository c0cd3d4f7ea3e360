package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.{SparkSuite, Tables}
import graft.functions.Exprs

/** dd_ppjoin's contract is EXACTNESS, not recall: prefix filtering is a
  * completeness theorem, so the result must EQUAL the brute-force
  * all-pairs Jaccard join — including on pairs whose shared shingles are
  * corpus-hot, which the df-capped heuristic (dd_ngram_jaccard) drops by
  * design.
  */
class PpJoinSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private def bruteForce(docs: org.apache.spark.sql.DataFrame) = {
    val sh = Dedup.docShinglesOf(spark, docs, 3)
      .select($"doc_id", Exprs.hash60($"shingle").as("h")).cache()
    val counts = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    sh.as("a").join(sh.as("b"), $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("common"))
      .join(counts.as("ca"), $"doc_a" === $"ca.doc_id")
      .join(counts.as("cb"), $"doc_b" === $"cb.doc_id")
      .withColumn("jaccard",
        round($"common".cast("double") / ($"ca.n" + $"cb.n" - $"common").cast("double"), 6))
      .filter($"jaccard" >= 0.5)
      .select($"doc_a", $"doc_b", $"common", $"jaccard")
  }

  test("prefix-filtered join equals the brute-force all-pairs join on testdata") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val got = Dedup.ppJoinPairs(spark, docs).collect().map(_.toSeq).toSet
    val want = bruteForce(docs).collect().map(_.toSeq).toSet
    withClue(s"ppjoin ${got.size} pairs vs brute ${want.size}") {
      got shouldBe want
      want should not be empty // non-vacuous on the real corpus
    }
  }

  test("finds duplicate pairs built entirely from corpus-hot shingles") {
    // one phrase shared by 200 docs → every one of its shingles has
    // df ≈ 200 > HotShingleDfCap, so the capped heuristic sees NO overlap
    // for the planted twins; the prefix filter still must (and does) rank
    // those shingles somewhere, and completeness guarantees the pair.
    val phrase = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val noise = (0 until 200).map(i => (i.toLong, s"$phrase filler$i trailing$i"))
    val twins = Seq((1000L, s"$phrase closing words here"),
      (1001L, s"$phrase closing words here"))
    val docs = (noise ++ twins).toDF("doc_id", "text")
    val got = Dedup.ppJoinPairs(spark, docs)
      .select($"doc_a", $"doc_b", $"jaccard").collect()
    val twinRow = got.find(r => r.getLong(0) == 1000L && r.getLong(1) == 1001L)
    withClue(s"pairs found: ${got.mkString(", ")}") {
      twinRow should not be empty
      twinRow.get.getDouble(2) shouldBe 1.0
    }
    // and still exact overall on this adversarial corpus
    got.map(_.toSeq).toSet shouldBe
      bruteForce(docs).select($"doc_a", $"doc_b", $"jaccard").collect().map(_.toSeq).toSet
  }
}
