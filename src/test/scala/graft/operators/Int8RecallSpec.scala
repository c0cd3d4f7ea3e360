package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Quality gate for the int8-quantized IVF path (the consumer of
  * sim_quantize_int8's output): scoring candidates with exact integer dot
  * products over int8 vectors must preserve the float ranking closely
  * enough that (a) the probe's top-10 still overlaps the float IVF top-10
  * almost completely — same candidates, scores perturbed only by
  * quantization noise — and (b) recall vs the exact float brute-force
  * baseline matches the float IVF's own gate. A third check bounds the
  * quantized-cosine error itself: for 64-dim unit vectors the per-element
  * rounding budget keeps |cos8 - cos| well under 0.02.
  */
class Int8RecallSpec extends SparkSuite with Matchers {

  private val dir = sf("sf0.001")

  private def byName(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("sim_ivf_int8: top-10 overlap vs float IVF >= 0.8 and vs brute force >= 0.4") {
    val ivfF = byName("sim_ivf_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf8 = byName("sim_ivf_int8").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = byName("sim_topk_bruteforce").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    ivf8 should not be empty
    // identical candidate sets (same centroids, same nprobe) — only the
    // scoring differs, so near-total agreement with the float IVF is the
    // invariant that says quantization didn't scramble the ranking
    (ivfF.intersect(ivf8).size.toDouble / ivfF.size) should be >= 0.8
    (bf.intersect(ivf8).size.toDouble / bf.size) should be >= 0.4
  }

  test("sim_ivf_int8: quantized cosine tracks the float cosine within the rounding budget") {
    val cosF = byName("sim_topk_bruteforce").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cos8 = byName("sim_ivf_int8").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
    val checkable = cos8.filter { case (k, _) => cosF.contains(k) }
    checkable should not be empty
    checkable.foreach { case (k, c8) =>
      math.abs(c8 - cosF(k)) should be <= 0.02
    }
  }
}
