package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins the fused [[TextStats]] struct to the composed formulation it
  * replaced — `length(text)`, `size(norm_words(text))`,
  * `length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))` and
  * `size(filter(norm_words(text), w -> w IN stopEn))` — exact equality on
  * randomized inputs covering unicode (multi-byte codepoints count as
  * punct), case folding, the full Java `\s` class, stopwords at string
  * boundaries, and empty/whitespace-only/null strings.
  */
class TextStatsSpec extends SparkSuite with Matchers {

  private val stopEn = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  private def check(inputs: Seq[String]): Unit = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("t", StringType)))
    val df = spark.createDataFrame(inputs.map(Row(_)).asJava, schema)
    // sql.functions length/size collide with Matchers' length/size words
    val F = org.apache.spark.sql.functions
    val toks = Exprs.normWords(col("t"))
    val st = Exprs.textStats(col("t"))
    val strLen = F.length(col("t"))
    val cleanLen = F.length(regexp_replace(col("t"), "[^a-zA-Z0-9\\s]", ""))
    val rows = df.select(
      st.getField("char_len"), st.getField("n_tokens"),
      st.getField("n_punct"), st.getField("n_stop"),
      strLen.cast("long"),
      F.size(toks).cast("long"),
      (strLen - cleanLen).cast("long"),
      F.size(F.filter(toks, (w: org.apache.spark.sql.Column) => w.isin(stopEn: _*)))
        .cast("long")).collect()
    for ((r, in) <- rows.zip(inputs)) {
      withClue(s"input=${Option(in).map(_.take(80))}: ") {
        if (in == null) (0 to 7).foreach(i => r.isNullAt(i) shouldBe true)
        else (0 to 3).foreach(i => r.getLong(i) shouldBe r.getLong(i + 4))
      }
    }
  }

  test("handwritten edge cases incl. unicode, boundaries and null") {
    check(Seq(
      "The quick brown fox and a dog", "the", "it", "a a a", "", "   ",
      "\t\n\f\r", "of!", "!of", "to-be", "in.the.end", "IT IS THE",
      "déjà vu — naïve café", "ÜBER Straße 42", "日本語 text of it",
      "punct!!! only???", "a9z and 0the1", "word's it's the's",
      "ends with the", "the starts", null))
  }

  test("property: equals the composed formulation on 500 random strings") {
    val rnd = new scala.util.Random(4321)
    val alphabet =
      "abctheofinsXYZ019 \t\n\f\r.,!?'—éüñß日 -_/"
    val inputs = (1 to 500).map { _ =>
      val n = rnd.nextInt(80)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    check(inputs)
  }
}
