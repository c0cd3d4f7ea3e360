package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for incremental-ingest dedup (dd_minhash_incr, also oracle-checked):
  * the persisted-index path must reproduce exactly the mixed (new, old)
  * subset of the one-shot corpus-wide pairs, and the arrival batch's plan
  * must read the signature index, not re-derive the corpus signatures.
  */
class IncrDedupSpec extends SparkSuite with Matchers {

  test("incremental result ≡ the mixed subset of the one-shot pairs") {
    val dir = sf("sf0.01") // sf0.001 has no cross-split near-dups to pin
    val oneShot = graft.SparkEntry.queries("dd_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val mixed = oneShot.filter { case (a, b, _) =>
      (a % Dedup.IncrMod == Dedup.IncrRem) != (b % Dedup.IncrMod == Dedup.IncrRem)
    }.map { case (a, b, j) =>
      if (a % Dedup.IncrMod == Dedup.IncrRem) (a, b, j) else (b, a, j)
    }.sortBy(t => (t._1, t._2))
    val incr = graft.SparkEntry.queries("dd_minhash_incr")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(t => (t._1, t._2))
    mixed should not be empty // non-vacuous at this SF (11 pairs)
    incr shouldBe mixed.toSeq
  }

  test("the arrival query reads the persisted signature index") {
    val p = graft.SparkEntry.queries("dd_minhash_incr")(spark, sf("sf0.01"))
      .queryExecution.executedPlan.toString
    p should include("graft-minhash-index")
  }
}
