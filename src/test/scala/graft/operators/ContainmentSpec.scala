package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.{SparkSuite, Tables}
import graft.functions.Exprs

/** dd_containment's contract is EXACTNESS: the asymmetric prefix filter is
  * a completeness theorem, so the result must EQUAL the brute-force
  * all-ordered-pairs containment join — including the case symmetric
  * Jaccard dedup is blind to, a small doc sliced out of a big one
  * (containment 1.0 at tiny Jaccard).
  */
class ContainmentSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private def bruteForce(docs: org.apache.spark.sql.DataFrame) = {
    val sh = Dedup.docShinglesOf(spark, docs, 3)
      .select($"doc_id", Exprs.hash60($"shingle").as("h")).cache()
    val counts = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    sh.as("a").join(sh.as("b"), $"a.h" === $"b.h" && $"a.doc_id" =!= $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("common"))
      .join(counts.as("ca"), $"doc_a" === $"ca.doc_id")
      .withColumn("containment",
        round($"common".cast("double") / $"ca.n".cast("double"), 6))
      .filter($"containment" >= 0.75)
      .select($"doc_a", $"doc_b", $"common", $"containment")
  }

  test("candidate generation is a hash equi-join — no cartesian in the plan") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val plan = Dedup.containmentPairs(spark, Tables.documents(spark, sf("sf0.001")))
      .queryExecution.executedPlan
    plan.collect { case c: CartesianProductExec => c } shouldBe empty
    plan.collect { case b: BroadcastNestedLoopJoinExec => b } shouldBe empty
  }

  test("prefix-filtered containment equals brute force on testdata") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val got = Dedup.containmentPairs(spark, docs).collect().map(_.toSeq).toSet
    val want = bruteForce(docs).collect().map(_.toSeq).toSet
    withClue(s"containment ${got.size} pairs vs brute ${want.size}") {
      got shouldBe want
      want should not be empty // non-vacuous on the real corpus
    }
  }

  test("a doc sliced out of a bigger one: containment 1.0, Jaccard-invisible") {
    val big = (0 until 60).map(i => s"word${i}a word${i}b word${i}c").mkString(" ")
    val slice = big.split(" ").slice(30, 45).mkString(" ") // contiguous slice
    val noise = (0 until 50).map(i =>
      (i.toLong, s"unrelated${i} filler${i} padding${i} tail${i} more${i}"))
    val docs = (noise ++ Seq((900L, big), (901L, slice))).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(spark, docs).collect()
    val row = got.find(r => r.getLong(0) == 901L && r.getLong(1) == 900L)
    withClue(s"pairs found: ${got.mkString(", ")}") {
      row should not be empty
      row.get.getDouble(3) shouldBe 1.0 // every slice shingle is in big
    }
    // the symmetric view scores this pair FAR below any dedup threshold
    val bigN = big.split(" ").length - 2
    val sliceN = slice.split(" ").length - 2
    val jaccard = sliceN.toDouble / (bigN + sliceN - sliceN)
    jaccard should be < 0.1
    // reverse direction absent: big is NOT contained in slice
    got.find(r => r.getLong(0) == 900L && r.getLong(1) == 901L) shouldBe None
    // and still exact overall on this corpus
    got.map(_.toSeq).toSet shouldBe bruteForce(docs).collect().map(_.toSeq).toSet
  }
}
