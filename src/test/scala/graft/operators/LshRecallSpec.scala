package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Recall gates for the embedding LSH scale paths.
  *
  * Two regimes, matching [[HyperplaneLsh]]'s two operating points:
  *  - sim_lsh_topk on the sf0.001 RANDOM vectors (the adversarial,
  *    no-cluster case for ANN): top-10 overlap vs brute force;
  *  - dd_embedding_lsh's pipeline on a CLUSTERED fixture (the case near-dup
  *    dedup exists for — members of a cluster are mutual near-dups at
  *    cos ≥ 0.85): recall ≥ 0.9 and precision 1.0 vs the exact pair set.
  *    On random vectors the tight b=10 buckets rightly generate few
  *    candidates (that is the point — random pairs are NOT near-dups), so
  *    the random-data assertion is precision + non-emptiness, not recall.
  *
  * Round 1's single-table LSH returned zero candidates; these specs make
  * that class of regression a test failure instead of a silently-empty
  * result.
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

  test("dd_embedding_lsh: precision 1.0 and non-empty on random vectors") {
    val exact = byName("dd_embedding_cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = byName("dd_embedding_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    exact should not be empty
    lsh should not be empty
    lsh.subsetOf(exact) shouldBe true // every reported pair is exactly verified
  }

  test("dd_embedding_lsh pipeline: recall >= 0.9, precision 1.0 on clustered vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = HyperplaneLsh.Dim
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    // 50 clusters x 10 members: unit center + small noise => within-cluster
    // pairs sit at high cosine (the near-dup regime), cross-cluster pairs at
    // random-vector cosines.
    val centers = Array.fill(50)(normalize(Array.fill(dim)(rnd.nextGaussian())))
    val vecs = for {
      c <- centers.indices
      m <- 0 until 10
    } yield (c.toLong * 10 + m,
      normalize(centers(c).zip(Array.fill(dim)(rnd.nextGaussian() * 0.03))
        .map { case (a, b) => a + b }))
    val threshold = 0.85
    // exact pair set, driver-side (n=500 is trivial)
    val byId = vecs.toMap
    val exact = (for {
      (i, vi) <- vecs; (j, vj) <- vecs if i < j
      cos = vi.zip(vj).map { case (a, b) => a * b }.sum
      if cos >= threshold
    } yield (i, j)).toSet
    exact.size should be >= 500 // within-cluster pairs exist in quantity
    val df = vecs.toDF("vec_id", "v")
    val got = Dedup.embeddingLshPairs(spark, df, threshold).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    withClue(s"recall=${exact.intersect(got).size.toDouble / exact.size}: ") {
      (exact.intersect(got).size.toDouble / exact.size) should be >= 0.9
    }
    // precision: every reported pair really is >= threshold (allow the
    // round-6 boundary the query itself applies)
    for ((a, b) <- got) {
      val cos = byId(a).zip(byId(b)).map { case (x, y) => x * y }.sum
      cos should be >= (threshold - 1e-6)
    }
  }
}
