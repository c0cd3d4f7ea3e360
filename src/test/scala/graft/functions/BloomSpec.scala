package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins [[BloomAgg]]'s semantics against an independent reference
  * formulation (a plain distinct set of probe positions), its
  * partitioning-invariance (merge = OR is the whole contract), the
  * no-false-negative guarantee, and — with a deliberately undersized
  * filter — that false positives occur and are exactly the keys the
  * downstream verification join must re-check.
  */
class BloomSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private val M = 4096 // small m so the fixture exercises word boundaries
  private val K = 3

  /** Reference: the bit positions BloomAgg must set, computed by an
    * independent Scala path (collect + set arithmetic on the driver).
    */
  private def refPositions(keys: Seq[Long], m: Int, k: Int): Set[Long] =
    keys.flatMap { h =>
      val h1 = h % m
      val h2 = 2L * ((h / m) % m) + 1L
      (0 until k).map(i => (h1 + i * h2) % m)
    }.toSet

  private def bitsOf(df: org.apache.spark.sql.DataFrame): Array[Long] =
    df.agg(BloomAgg(col("h"), M, K).as("bits"))
      .collect().head.getSeq[Long](0).toArray

  private def setPositions(bits: Array[Long]): Set[Long] =
    (0L until M.toLong).filter(p => (bits((p >>> 6).toInt) & (1L << (p & 63L))) != 0L).toSet

  test("bloom_agg sets exactly the Kirsch-Mitzenmacher positions of its inputs") {
    val keys = (1L to 500L).map(i => i * 2654435761L % (1L << 60))
    val got = setPositions(bitsOf(keys.toDF("h")))
    got shouldBe refPositions(keys, M, K)
  }

  test("bloom_agg is partitioning-invariant (merge = OR)") {
    val keys = (1L to 500L).map(i => i * 2654435761L % (1L << 60))
    val one = bitsOf(keys.toDF("h").repartition(1))
    val many = bitsOf(keys.toDF("h").repartition(7))
    many shouldBe one
  }

  test("mightContain: no false negatives; an undersized filter's false positives are caught by exact verify") {
    val inserted = (1L to 400L).map(i => i * 2654435761L % (1L << 60))
    val probesDf = (1L to 3000L).map(i => i * 1099511628211L % (1L << 60)).toDF("h")
    val bloom = inserted.toDF("h").agg(BloomAgg(col("h"), M, K).as("bits"))
    val flagged = probesDf.crossJoin(broadcast(bloom))
      .filter(BloomAgg.mightContain("bits", "h", M, K))
      .select("h").as[Long].collect().toSet
    // every inserted key that is probed must be flagged (no false negatives)
    val probed = probesDf.as[Long].collect().toSet
    val insertedSet = inserted.toSet
    (probed intersect insertedSet).foreach(h => flagged should contain(h))
    // m=4096 for 400 keys × 3 probes ⇒ ~25% fill ⇒ FPs are expected...
    val fps = flagged -- insertedSet
    fps should not be empty
    // ...and the exact-verification join removes every one of them
    val verified = flagged intersect insertedSet
    verified shouldBe (probed intersect insertedSet)
  }

  test("null hashes are ignored, empty input yields an all-zero filter") {
    val bits = Seq[Option[Long]](None, None).toDF("h")
      .agg(BloomAgg(col("h"), M, K).as("bits"))
      .collect().head.getSeq[Long](0)
    bits.forall(_ == 0L) shouldBe true
    bits.length shouldBe M / 64
  }
}
