package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Quality gate for the IVF ANN path: probing nprobe=3 of the K coarse
  * partitions must still find a useful fraction of the true top-10 (the
  * DuckDB oracle pins sim_ivf_topk's mechanics; this pins that the mechanics
  * are WORTH something vs the exact baseline). Random 64-dim vectors with no
  * cluster structure are the adversarial case for IVF — real embedding
  * corpora cluster, and recall only improves from here.
  */
class IvfRecallSpec extends SparkSuite with Matchers {

  private val dir = sf("sf0.001")

  private def byName(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("sim_ivf_topk: non-empty, top-10 overlap vs brute force >= 0.4") {
    val bf = byName("sim_topk_bruteforce").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = byName("sim_ivf_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    ivf should not be empty
    // nprobe/K = 3/10 of the data scanned; on clusterless random vectors the
    // top-10 overlap stays well above the 0.3 a random 30% subset would give
    // because a query's nearest vectors share its quantizer cell more often
    // than chance even in the no-structure regime.
    val overlap = bf.intersect(ivf).size.toDouble / bf.size
    overlap should be >= 0.4
  }

  test("sim_ivf_topk: every reported neighbor's cosine is exact (subset check)") {
    // IVF never fabricates scores: each (query, cand, cos) must appear in
    // the brute-force scoring with the identical rounded cosine.
    val bf = byName("sim_topk_bruteforce").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = byName("sim_ivf_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    // only pairs that made the exact top-10 can be cross-checked for score
    val checkable = ivf.filter { case (k, _) => bf.contains(k) }
    checkable should not be empty
    checkable.foreach { case (k, cos) => cos shouldBe bf(k) }
  }
}
