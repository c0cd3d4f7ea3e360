package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Invariants for the round-6 training-data pipeline additions beyond what
  * the DuckDB oracle pins (the oracle proves cross-engine equality; these
  * prove the operators mean what they claim).
  */
class PipelineOpsSpec extends SparkSuite with Matchers {

  private val dir = sf("sf0.001")

  test("dd_span_dup: ratio bounds, keep-rule consistency, non-vacuous dup signal") {
    val rows = graft.SparkEntry.queries("dd_span_dup")(spark, dir).collect()
    rows.length should be > 0
    var dup = 0L
    for (r <- rows) {
      val (n, d, ratio, keep) = (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
      d should be <= n
      ratio should (be >= 0.0 and be <= 1.0)
      keep shouldBe (n == 0 || d * 2 < n)
      dup += d
    }
    dup should be > 0L // the corpus really contains cross-doc 8-gram repeats
  }

  test("ta_decontam: every planted leak flagged, benchmark slice excluded") {
    val rows = graft.SparkEntry.queries("ta_decontam")(spark, dir).collect()
    val byId = rows.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    byId.keys.exists(_ % 97 == 0) shouldBe false // benchmark docs not scored
    val leaked = byId.keys.filter(id => id % 31 == 5)
    leaked should not be empty
    leaked.foreach(id => withClue(s"doc $id: ") { byId(id) shouldBe true })
    // canary-free docs dominate and are clean in this corpus
    byId.count(!_._2) should be > (byId.size / 2)
  }

  test("plan shapes: decontam broadcasts the benchmark grams; span_dup joins hashed keys only") {
    val decontam = withPlainSort {
      graft.SparkEntry.queries("ta_decontam")(spark, dir)
        .queryExecution.executedPlan.toString
    }
    decontam should include("BroadcastHashJoin") // bench gram set broadcasts
    (decontam should not).include("CartesianProduct")
    val spanDup = graft.SparkEntry.queries("dd_span_dup")(spark, dir)
      .queryExecution.executedPlan.toString
    (spanDup should not).include("CartesianProduct")
    (spanDup should not).include("BroadcastNestedLoopJoin")
  }

  test("ta_seq_pack: per-shard contiguity and budget arithmetic") {
    val rows = graft.SparkEntry.queries("ta_seq_pack")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    rows.length should be > 0
    for ((_, _, n, first, last, packs) <- rows) {
      packs shouldBe (last - first + 1)
      last should be >= first
      // a doc of n tokens can span at most ceil(n/512)+1 packs
      packs should be <= (n / 512 + 2)
    }
    // contiguity: within a shard (doc_id order), offsets never go backwards
    rows.groupBy(_._2).values.foreach { shard =>
      val ordered = shard.sortBy(_._1)
      ordered.sliding(2).foreach {
        case Array((_, _, _, _, lastA, _), (_, _, _, firstB, _, _)) =>
          firstB should be >= lastA - 1 // next doc starts in or after prev's last pack
        case _ =>
      }
    }
  }
}
