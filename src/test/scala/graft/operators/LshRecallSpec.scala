package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Recall gates for the embedding LSH scale paths against their exact
  * baselines, on the sf0.001 driver testdata (500 random 64-dim vectors —
  * the adversarial, no-cluster case for ANN). Round 1's single-table LSH
  * returned zero candidates; these specs make that class of regression a
  * test failure instead of a silently-empty result.
  */
class LshRecallSpec extends SparkSuite with Matchers {

  private val dir = sf("sf0.001")

  private def byName(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("sim_lsh_topk: non-empty, top-10 overlap vs brute force >= 0.8") {
    val bf = byName("sim_topk_bruteforce").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = byName("sim_lsh_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    lsh should not be empty
    val overlap = bf.intersect(lsh).size.toDouble / bf.size
    overlap should be >= 0.8
  }

  test("dd_embedding_lsh: recall >= 0.9 and precision 1.0 vs exact pairs") {
    val exact = byName("dd_embedding_cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = byName("dd_embedding_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    exact should not be empty
    lsh should not be empty
    (exact.intersect(lsh).size.toDouble / exact.size) should be >= 0.9
    lsh.subsetOf(exact) shouldBe true // every reported pair is exactly verified
  }
}
