package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins the U1/U2 native expressions to the reference's Python UDF truth
  * tables (reference `src/pyspark/pipeline_pyspark.py:36-56`; trap cases
  * from SURVEY §7.5).
  */
class ExprsSpec extends SparkSuite with Matchers {

  private def evalBool(dt: DataType, values: Seq[Any]): Seq[Boolean] = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("v", dt)))
    val rows = values.map(v => org.apache.spark.sql.Row(v)).asJava
    spark.createDataFrame(rows, schema)
      .select(Exprs.boolNorm(col("v"), dt).as("b"))
      .collect().map(_.getBoolean(0)).toSeq
  }

  test("U1 string path: reference truth table incl. the '0.5' trap") {
    // Python: str(v).strip().lower() in ("1","true","yes","y","t")
    val in = Seq("1", "true", "yes", "y", "t", " T ", "TRUE", "Yes",
      "0", "false", "no", "0.5", "2", "oui", "", null)
    val expected = Seq(true, true, true, true, true, true, true, true,
      false, false, false, false, false, false, false, false)
    evalBool(StringType, in) shouldBe expected
  }

  test("U1 numeric path: bool(v) semantics — 0 false, anything else true") {
    evalBool(DoubleType, Seq(0.0, 0.5, -1.0, 42.0, null)) shouldBe
      Seq(false, true, true, true, false)
    evalBool(LongType, Seq(0L, 1L, -7L, null)) shouldBe
      Seq(false, true, true, false)
  }

  test("U1 boolean path: identity with null → false") {
    evalBool(BooleanType, Seq(true, false, null)) shouldBe Seq(true, false, false)
  }

  test("U2 lenient: both formats parse, garbage nulls") {
    import spark.implicits._
    val out = Seq("2025-03-05 14:30:00", "2025-03-05", "garbage", null).toDF("ts")
      .select(Exprs.orderDateStr($"ts").as("d")).collect().map(r => Option(r.getString(0)))
    out shouldBe Array(Some("2025-03-05"), Some("2025-03-05"), None, None)
  }

  test("U2 strict: raises on unparseable input like the reference UDF") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq("not-a-date").toDF("ts")
        .select(Exprs.orderDateStrStrict($"ts")).collect()
    }
    ex.getMessage should include("unparseable date")
    // and parseable input does NOT raise
    Seq("2025-03-31").toDF("ts")
      .select(Exprs.orderDateStrStrict($"ts").as("d"))
      .collect().head.getString(0) shouldBe "2025-03-31"
  }

  test("fingerprint: case/whitespace-insensitive, content-sensitive") {
    import spark.implicits._
    val fp = Seq("Hello  World", "hello world", "hello worlds").toDF("t")
      .select(Exprs.fingerprint($"t").as("f")).collect().map(_.getString(0))
    fp(0) shouldBe fp(1)
    fp(0) should not be fp(2)
  }

  test("shingles: 3-grams over tokens; short docs yield empty array") {
    import spark.implicits._
    val out = Seq("a b c d", "a b").toDF("t")
      .select(Exprs.shingles(Exprs.words($"t"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    out(0) shouldBe Seq("a b c", "b c d")
    out(1) shouldBe Seq.empty
  }

  test("words: punctuation stripped, empties dropped, lowercased via normText") {
    import spark.implicits._
    Seq("  Héllo,  World!! 42 ").toDF("t")
      .select(Exprs.words(Exprs.normText($"t")).as("w"))
      .collect().head.getSeq[String](0) shouldBe Seq("h", "llo", "world", "42")
  }

  test("DotProduct: codegen result equals scalar loop; null array → null") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    df.select(Exprs.dot($"a", $"b").as("d")).collect().head.getDouble(0) shouldBe 32.0
    val withNull = df.select(Exprs.dot(lit(null).cast("array<double>"), $"b").as("d"))
    withNull.collect().head.isNullAt(0) shouldBe true
  }

  test("DotProduct: rejects non-array<double> inputs at analysis") {
    import spark.implicits._
    intercept[AnalysisException] {
      Seq(("x", "y")).toDF("a", "b").select(Exprs.dot($"a", $"b")).collect()
    }
  }

  test("cosine: identical vectors → 1.0") {
    import spark.implicits._
    val c = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
      .select(Exprs.cosine($"a", $"b").as("c")).collect().head.getDouble(0)
    c shouldBe 1.0 +- 1e-12
  }
}
