package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Hand-built edge shapes for the HTML boilerplate extractor — the cases
  * the planted-corpus oracle replay can't isolate: nav/footer/ad chrome
  * must drop, a long body paragraph must survive, an inline anchor inside
  * a good block must not kill it, and a document that is ALL boilerplate
  * must extract to '' (not NULL).
  */
class HtmlExtractSpec extends SparkSuite with Matchers {

  private val Body =
    "the quick brown fox jumps over a lazy dog and runs to the river in " +
      "the morning light while it is still cool and the air is fresh"

  private def extract(htmls: String*): Seq[(Long, Long, String)] = {
    import spark.implicits._
    htmls.toDF("html")
      .select((col("html") +: HtmlExtract.extractCols($"html")): _*)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(4))).toSeq
  }

  test("chrome drops, body survives") {
    val (nBlocks, nKept, text) = extract(
      "<html><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/x\">About</a></nav>" +
        s"<p>$Body</p>" +
        "<footer><a href=\"/p\">privacy</a> <a href=\"/t\">terms</a></footer>" +
        "</body></html>").head
    nBlocks shouldBe 3L
    nKept shouldBe 1L
    text shouldBe Body
  }

  test("an inline anchor inside a good block does not kill it") {
    val (_, nKept, text) =
      extract(s"<p>$Body see <a href=\"/ref\">a link</a></p>").head
    nKept shouldBe 1L
    text shouldBe s"$Body see a link"
  }

  test("a link-dominated block drops even when long") {
    // 8 anchors of prose-length labels: visible text is long but >50%
    // of it is anchor text — the link-density rule must fire.
    val links = (1 to 8)
      .map(i => s"<a href=\"/$i\">the section number $i of this site</a>")
      .mkString("<div>", " ", "</div>")
    val (nBlocks, nKept, text) = extract(links).head
    nBlocks shouldBe 1L
    nKept shouldBe 0L
    text shouldBe ""
  }

  test("short and stopword-free blocks drop; all-boiler extracts to ''") {
    val (nBlocks, nKept, text) = extract(
      "<html><head><title>site</title></head><body>" +
        "<h1>doc 42</h1>" +
        "<aside>tags t1 t2</aside>" +
        "<footer>copyright site 2026</footer>" +
        "</body></html>").head
    nBlocks shouldBe 4L
    nKept shouldBe 0L
    text shouldBe ""
  }

  test("a stopword-free block still keeps at saturation length") {
    // No stopwords at all, but past LongVisChars — length saturation
    // keeps it (jusText's long-block rule).
    val words = (1 to 30).map(i => s"word$i").mkString(" ")
    words.length should be >= HtmlExtract.LongVisChars
    val (_, nKept, text) = extract(s"<p>$words</p>").head
    nKept shouldBe 1L
    text shouldBe words
  }

  test("tag attributes never leak into visible text; case-insensitive tags split") {
    val (nBlocks, nKept, text) = extract(
      s"""<DIV class="main" data-x="dropme">$Body</DIV>""").head
    nBlocks shouldBe 1L
    nKept shouldBe 1L
    text shouldBe Body
  }

  test("planted corpus: every doc splits into its chrome+body blocks") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("ta_html_extract")(spark, sf("sf0.001"))
      .collect()
    out.length should be > 0
    out.foreach { r =>
      // title, nav, h1, two body paragraphs = 5 mandatory blocks; ad,
      // sidebar and footer cycle in for at most 8
      r.getLong(1) should (be >= 5L and be <= 8L)
      // extraction never keeps chrome: at most the two body paragraphs
      r.getLong(2) should be <= 2L
      // kept_chars is consistent with the reassembled text
      r.getLong(3) shouldBe r.getString(4).length.toLong
    }
    // the classifier must actually split: some docs keep, and across the
    // corpus some body halves drop (short first halves exist)
    out.map(_.getLong(2)).max shouldBe 2L
    out.count(_.getLong(2) < 2L) should be > 0
  }
}
