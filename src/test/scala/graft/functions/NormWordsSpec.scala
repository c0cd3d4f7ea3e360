package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins the single-scan [[NormWords]] expression to the regex chain it
  * replaced (`filter(split(trim(regexp_replace(lower(text), "[^a-z0-9\\s]",
  * " ")), "\\s+"), _ != "")`) — exact array equality on randomized inputs
  * covering unicode (multi-byte separators), case folding, digits,
  * punctuation runs, and whitespace-only/empty/null strings.
  */
class NormWordsSpec extends SparkSuite with Matchers {

  private def regexChain(c: org.apache.spark.sql.Column) =
    filter(split(trim(regexp_replace(lower(c), "[^a-z0-9\\s]", " ")), "\\s+"),
      w => w =!= lit(""))

  private def check(inputs: Seq[String]): Unit = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("t", StringType)))
    val df = spark.createDataFrame(inputs.map(Row(_)).asJava, schema)
    val rows = df.select(
      Exprs.normWords(col("t")).as("fast"),
      regexChain(col("t")).as("ref")).collect()
    for ((r, in) <- rows.zip(inputs)) {
      withClue(s"input=${Option(in).map(_.take(80))}: ") {
        r.getSeq[String](0) shouldBe r.getSeq[String](1)
      }
    }
  }

  test("handwritten edge cases incl. unicode and null") {
    check(Seq(
      "Hello, World! 123", "  leading and trailing  ", "", "   ", "\t\n\r",
      "déjà vu — naïve café", "ÜBER Straße", "a", "9", "a9z", "!!!", "a!!!b",
      "MIXED case AND 42 numbers", "tabs\tand\nnewlines", "ñ", "日本語 text here",
      "apostrophe's and-hyphen", null))
  }

  test("property: equals the regex chain on 500 random strings") {
    val rnd = new scala.util.Random(1234)
    val alphabet =
      "abcXYZ019 \t\n.,!?'—éüñß日 -_/" // incl. NBSP (not Java \s — both sides must agree)
    val inputs = (1 to 500).map { _ =>
      val n = rnd.nextInt(60)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    check(inputs)
  }
}
