package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for the URL-category blocklist filter: every doc's verdict is
  * recomputed independently from (doc_id, source) — suffix matching at
  * both depths, the longest-match precedence (the h5.src3 row must shadow
  * the src3 domain row), the decoy entry never matches, and unlisted
  * hosts pass.
  */
class BlocklistSpec extends SparkSuite with Matchers {

  test("suffix match at both depths, longest wins, decoy never hits") {
    import spark.implicits._
    val dir = sf("sf0.01")
    val out = graft.SparkEntry.queries("ta_blocklist")(spark, dir).collect()
    val src = graft.Tables.documents(spark, dir)
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.length shouldBe src.size
    out.foreach { r =>
      val id = r.getLong(0); val s0 = src(id); val m = id % 7
      val expCat =
        if (s0 == "src3" && m == 5) Some("tracking") // most specific entry wins
        else if (s0 == "src3") Some("ads")
        else if (s0 == "src7") Some("adult")
        else if (s0 == "src11" && m == 2) Some("gambling")
        else None
      withClue(s"doc $id ($s0, h$m): ") {
        r.getString(1) shouldBe s"h$m.$s0.example.com"
        Option(r.getString(3)) shouldBe expCat
        r.getBoolean(4) shouldBe expCat.nonEmpty
      }
    }
    // every blocklist depth is actually exercised by the corpus...
    out.count(_.getString(3) == "tracking") should be > 0
    out.count(_.getString(3) == "ads") should be > 0
    out.count(_.getString(3) == "gambling") should be > 0
    out.count(_.getString(3) == "adult") should be > 0
    // ...the decoy entry never matches, and most of the corpus passes
    out.count(_.getString(2) == "src99.example.com") shouldBe 0
    out.count(!_.getBoolean(4)) should be > (out.length / 2)
  }
}
