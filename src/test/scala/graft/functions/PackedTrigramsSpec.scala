package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins [[PackedTrigrams]] to the string formulation it replaced:
  * `trim(regexp_replace(lower(text), "[^a-z]+", " "))` then 3-char
  * substrings, each packed with ' '→0,'a'→1…'z'→26 base-32 — exact array
  * equality on randomized and handwritten inputs (unicode separators, runs
  * of non-letters, short strings).
  */
class PackedTrigramsSpec extends SparkSuite with Matchers {

  private def check(inputs: Seq[String]): Unit = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("t", StringType)))
    val packTri = (tri: org.apache.spark.sql.Column) => {
      def code(i: Int) = {
        val a = ascii(substring(tri, i, 1))
        when(a === 32, 0).otherwise(a - 96)
      }
      (code(1) * 1024 + code(2) * 32 + code(3)).cast("int")
    }
    val rows = spark.createDataFrame(inputs.map(Row(_)).asJava, schema)
      .withColumn("norm", trim(regexp_replace(lower(col("t")), "[^a-z]+", " ")))
      .withColumn("ref_s", when(org.apache.spark.sql.functions.length(col("norm")) >= 3,
          expr("transform(sequence(1, length(norm) - 2), i -> substring(norm, i, 3))"))
        .otherwise(array().cast("array<string>")))
      .select(
        // NULL text: the expression propagates null (standard unary-expr
        // semantics) where the when().otherwise chain yields [] — identical
        // after the explode_outer both formulations feed (one null row).
        // Compare through that equivalence.
        coalesce(Exprs.packedTrigrams(col("t")), array().cast("array<int>")).as("fast"),
        transform(col("ref_s"), packTri).as("ref"))
      .collect()
    for ((r, in) <- rows.zip(inputs)) {
      withClue(s"input=${Option(in).map(_.take(60))}: ") {
        r.getSeq[Int](0) shouldBe r.getSeq[Int](1)
      }
    }
  }

  test("handwritten edge cases") {
    check(Seq(
      "hello world", "Déjà — vu!", "  a  b  c  ", "ab", "", "   ", "a1b2c3",
      "ÜBER straße", "x", "the quick brown fox", "a--b__c", null, "日本語abc日本"))
  }

  test("property: equals the string chain on 400 random strings") {
    val rnd = new scala.util.Random(77)
    val alphabet = "abcXYZ019 \t.,!é—ü日 -"
    check((1 to 400).map { _ =>
      (1 to rnd.nextInt(50)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    })
  }
}
