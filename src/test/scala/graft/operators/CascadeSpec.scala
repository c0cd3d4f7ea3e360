package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for the dedup cascade's attribution invariants, independently of
  * the oracle replay: the stages PARTITION the corpus (every doc exactly
  * one verdict), each dup's attribution is verifiable against its keep
  * (same fingerprint / same canonical URL / exact Jaccard ≥ 0.5), dup_of
  * always points to a smaller 'keep'-or-earlier-stage survivor, and the
  * stage ordering is real (a doc caught by 'exact' never reappears later).
  */
class CascadeSpec extends SparkSuite with Matchers {

  test("stages partition the corpus and every attribution is verifiable") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val out = graft.SparkEntry.queries("dd_cascade")(spark, dir)
    val docs = graft.Tables.documents(spark, dir)

    // partition: one verdict per doc, all docs covered
    out.count() shouldBe docs.count()
    out.select($"doc_id").distinct().count() shouldBe docs.count()

    val rows = out.collect()
    rows.foreach { r =>
      val stage = r.getString(1)
      withClue(s"doc ${r.getLong(0)} stage $stage: ") {
        if (stage == "keep") r.isNullAt(2) shouldBe true
        else {
          r.isNullAt(2) shouldBe false
          r.getLong(2) should be < r.getLong(0) // dup_of is the smaller keeper
        }
      }
    }

    // exact dups really share the content fingerprint with their keeper
    val fp = docs.select($"doc_id",
      graft.functions.Exprs.fingerprint($"text").as("fp"))
    val exact = out.filter($"stage" === "exact")
    exact.join(fp, Seq("doc_id"))
      .join(fp.select($"doc_id".as("dup_of"), $"fp".as("fp_keep")), Seq("dup_of"))
      .filter($"fp" =!= $"fp_keep").count() shouldBe 0

    // url dups share the canonical URL with their keeper
    val cu = docs.select($"doc_id",
      UrlCuration.canonUrl(UrlCuration.dirtyUrl($"source", $"doc_id")).as("cu"))
    out.filter($"stage" === "url").join(cu, Seq("doc_id"))
      .join(cu.select($"doc_id".as("dup_of"), $"cu".as("cu_keep")), Seq("dup_of"))
      .filter($"cu" =!= $"cu_keep").count() shouldBe 0

    // near dups are verified pairs: J(doc, dup_of) >= 0.5 on the full corpus
    val pairs = Dedup.minhashLshPairs(spark, docs)
      .select($"doc_a", $"doc_b")
    out.filter($"stage" === "near")
      .join(pairs, $"dup_of" === $"doc_a" && $"doc_id" === $"doc_b", "left_anti")
      .count() shouldBe 0

    // ordering is real: a stage-1 dup's keeper is never itself a dup of a
    // LATER stage with a smaller id than the original doc (keepers of
    // 'exact'/'url' dups survive their own stage by construction)
    val dupOfStage = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.filter(_.getString(1) == "exact").foreach { r =>
      dupOfStage(r.getLong(2)) should !==("exact")
    }
    rows.filter(_.getString(1) == "url").foreach { r =>
      withClue(s"url dup ${r.getLong(0)} -> ${r.getLong(2)}: ") {
        Set("url", "exact").contains(dupOfStage(r.getLong(2))) shouldBe false
      }
    }
  }
}
