package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Planted cases for exact-substring duplicate-span removal
  * (dd_substr_dedup, also DuckDB-oracle-checked end-to-end): a copied span
  * ≥ W tokens is removed from every occurrence EXCEPT the globally first;
  * short docs and unique text are untouched; within-doc self-repetition is
  * caught too.
  */
class SubstrDedupSpec extends SparkSuite with Matchers {

  private val W = Dedup.SubstrWindow

  // 25 shared tokens (> W) planted into two docs; unique prefixes/suffixes.
  private val span = (1 to 25).map(i => s"shared$i").mkString(" ")

  private lazy val result = {
    import spark.implicits._
    val docs = Seq(
      // doc 0: first occurrence of the span — must be KEPT in full
      (0L, s"alpha bravo charlie $span delta echo foxtrot"),
      // doc 1: second occurrence — the span's windows are duplicates here
      (1L, s"golf hotel india $span juliett kilo lima"),
      // doc 2: unique text, longer than W — untouched
      (2L, (1 to 40).map(i => s"unique$i").mkString(" ")),
      // doc 3: shorter than W tokens — no windows, untouched
      (3L, "tiny doc under the window size"),
      // doc 4: self-repetition — the same 30-token run twice in ONE doc
      (4L, {
        val run = (1 to 30).map(i => s"rep$i").mkString(" ")
        s"$run $run"
      }))
      .toDF("doc_id", "text")
    Dedup.substrDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("first occurrence is kept in full; later occurrence loses the span") {
    val (n0, rm0, _) = result(0L)
    n0 shouldBe (3 + 25 + 3)
    rm0 shouldBe 0L
    val (n1, rm1, _) = result(1L)
    n1 shouldBe (3 + 25 + 3)
    // every window fitting inside the 25-token span is a duplicate; their
    // union covers exactly the span (the unique 3-token flanks break any
    // window that would reach outside it)
    rm1 shouldBe 25L
  }

  test("unique and under-window docs are untouched") {
    result(2L) shouldBe ((40L, 0L, md5Of((1 to 40).map(i => s"unique$i"))))
    result(3L)._2 shouldBe 0L
    result(3L)._1 shouldBe 6L
  }

  test("within-doc self-repetition is removed from the second run") {
    val (n4, rm4, fp4) = result(4L)
    n4 shouldBe 60L
    rm4 shouldBe 30L
    fp4 shouldBe md5Of((1 to 30).map(i => s"rep$i"))
  }

  private def md5Of(tokens: Seq[String]): String = {
    import spark.implicits._
    Seq(tokens.mkString(" ")).toDF("s").select(md5(col("s"))).collect().head.getString(0)
  }
}
