package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Split-invariance pin for the CDC apply (r10 verdict #6): ev_cdc_apply
  * claims last-writer-wins over a partial-aggregable state, so applying the
  * change log in ANY chunking — per-chunk state, merge, tombstone-filter
  * LAST — must equal the one-shot apply. Planted traps cover the two ways
  * a naive chunked apply goes wrong: filtering tombstones per-chunk loses
  * that chunk's n_changes and resurrects a D-latest key; and a D→U split
  * across chunks must resurrect WITH the full change count.
  */
class CdcSplitSpec extends SparkSuite with Matchers {

  private def log(rows: (Long, Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("seq", "key", "op", "val")
  }

  private def snap(df: DataFrame): Set[(Long, Long, Double, Long)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  private def chunkedApply(chunks: Seq[DataFrame]): DataFrame =
    Events.cdcSnapshot(Events.cdcMergeStates(chunks.map(Events.cdcPartialState)))

  test("planted traps: tombstone-after-merge and cross-chunk resurrect") {
    // key 1: plain upsert chain split across chunks
    // key 2: U in chunk 1, D in chunk 2 — must be ABSENT (latest is D)
    // key 3: D in chunk 1, U in chunk 2 — must resurrect with n_changes=2
    val c1 = log((1L, 1L, "U", 10.0), (2L, 2L, "U", 10.0), (3L, 3L, "D", 0.0))
    val c2 = log((5L, 1L, "U", 20.0), (7L, 2L, "D", 0.0), (8L, 3L, "U", 30.0))
    val expected = Set((1L, 5L, 20.0, 2L), (3L, 8L, 30.0, 2L))
    snap(chunkedApply(Seq(c1, c2))) shouldBe expected
    // one-shot over the union agrees
    snap(Events.cdcSnapshot(Events.cdcPartialState(c1.union(c2)))) shouldBe expected
    // chunk order is irrelevant (merge is commutative)
    snap(chunkedApply(Seq(c2, c1))) shouldBe expected
  }

  test("real log: every chunking equals the one-shot apply") {
    import spark.implicits._
    val fullLog = graft.Tables.orders(spark, sf("sf0.001")).select(
      $"o_orderkey".as("seq"), $"o_custkey".as("key"),
      when($"o_orderkey" % 11 === 0, "D").otherwise("U").as("op"),
      $"o_totalprice".as("val"))
    val oneShot = snap(Events.cdcSnapshot(Events.cdcPartialState(fullLog)))
    oneShot should not be empty
    // contiguous seq-range chunks (arrival order) and a 3-way interleave
    // (pathological routing) both reproduce it
    val bound = 750L
    val byRange = Seq(fullLog.filter($"seq" <= bound), fullLog.filter($"seq" > bound))
    snap(chunkedApply(byRange)) shouldBe oneShot
    val interleaved = (0L until 3L).map(i => fullLog.filter($"seq" % 3 === i))
    snap(chunkedApply(interleaved)) shouldBe oneShot
  }
}
