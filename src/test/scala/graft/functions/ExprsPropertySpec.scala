package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** ScalaCheck-generator property specs (SURVEY §2.9/§5): the native
  * expressions must agree with a direct Scala transcription of the
  * reference's Python UDFs on ARBITRARY generated inputs, not just the
  * curated truth table. Fixed seed → deterministic runs (no scalatestplus
  * bridge in the offline cache, so generators are driven directly).
  */
class ExprsPropertySpec extends SparkSuite with Matchers {

  private def samples[T](g: Gen[T], n: Int, seed0: Long = 42L): Seq[T] = {
    var s = Seed(seed0)
    (1 to n).map { _ =>
      val v = g.pureApply(Gen.Parameters.default, s)
      s = s.next
      v
    }
  }

  // Python: str(v).strip().lower() in ("1","true","yes","y","t")
  private def pythonBoolString(s: String): Boolean =
    s != null && Set("1", "true", "yes", "y", "t")(s.trim.toLowerCase(java.util.Locale.ROOT))

  private val weirdString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.oneOf("1", "true", "yes", "y", "t", "0", "false", "no", "0.5", "2"),
    Gen.alphaNumStr.map(s => s"  $s  "),
    Gen.oneOf("TRUE", " T ", "Yes", "nO", "", " ", "\ttrue\n", "vrai", "1.0", "01"))

  test("property: U1 string path == Python truth table on 300 generated strings") {
    import spark.implicits._
    val inputs = samples(weirdString, 300)
    val got = inputs.toDF("v")
      .select(Exprs.boolNormString($"v").as("b"))
      .collect().map(_.getBoolean(0)).toSeq
    got shouldBe inputs.map(pythonBoolString)
  }

  // Python: datetime.strptime(v, "%Y-%m-%d %H:%M:%S") else "%Y-%m-%d" → iso date
  private def pythonOrderDate(s: String): Option[String] = {
    def parse(fmt: String): Option[String] =
      try {
        val f = new java.text.SimpleDateFormat(fmt)
        f.setLenient(false)
        f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
        val d = f.parse(s)
        if (f.format(d) == s) // strptime consumes the WHOLE string, no leniency
          Some {
            val out = new java.text.SimpleDateFormat("yyyy-MM-dd")
            out.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
            out.format(d)
          }
        else None
      } catch { case _: Exception => None }
    parse("yyyy-MM-dd HH:mm:ss").orElse(parse("yyyy-MM-dd"))
  }

  private val dateish: Gen[String] = {
    val valid = for {
      y <- Gen.choose(1990, 2030); mo <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
      h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
      withTime <- Gen.oneOf(true, false)
    } yield if (withTime) f"$y%04d-$mo%02d-$d%02d $h%02d:$mi%02d:$s%02d" else f"$y%04d-$mo%02d-$d%02d"
    Gen.oneOf(valid, Gen.oneOf("garbage", "2025-13-01", "2025-02-30", "2025-03-05T10:00:00",
      "05/03/2025", "2025-03-05 25:00:00"))
  }

  test("property: U2 lenient parse == Python two-format strptime on 200 generated inputs") {
    import spark.implicits._
    val inputs = samples(dateish, 200)
    val got = inputs.toDF("ts")
      .select(Exprs.orderDateStr($"ts").as("d"))
      .collect().map(r => Option(r.getString(0))).toSeq
    got shouldBe inputs.map(pythonOrderDate)
  }

  test("property: fingerprint invariant under case and whitespace runs, 50 texts") {
    import spark.implicits._
    val text = Gen.listOfN(8, Gen.alphaNumStr.suchThat(_.nonEmpty)).map(_.mkString(" "))
    val all = samples(text, 50).flatMap { t =>
      Seq(t, t.toUpperCase(java.util.Locale.ROOT), s"  $t  ", t.replace(" ", "   "))
        .map(v => (t, v))
    }
    val fps = all.toDF("orig", "v")
      .select($"orig", Exprs.fingerprint($"v").as("f"))
      .groupBy($"orig").agg(countDistinct($"f").as("n"))
      .collect().map(_.getLong(1))
    all.size shouldBe 200
    fps.forall(_ == 1L) shouldBe true
  }

  test("property: codegen DotProduct == scalar fold on 100 generated vector pairs") {
    import spark.implicits._
    val vec = Gen.listOfN(16, Gen.choose(-1000.0, 1000.0))
    val pairs = samples(Gen.zip(vec, vec), 100).map { case (a, b) => (a.toArray, b.toArray) }
    val got = pairs.toDF("a", "b")
      .select(Exprs.dot($"a", $"b").as("d")).collect().map(_.getDouble(0)).toSeq
    val want = pairs.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y } // same fold order → bitwise equal
    }
    got shouldBe want
  }
}
