package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for SemDeDup's cluster-granularity valve: above [[Similarity.
  * SemClusterCap]] vectors, each label cluster splits by semBits(n)
  * hyperplane sign bits — one doubling per corpus doubling — so the
  * within-cluster quadratic stays bounded instead of growing with the
  * fixed 10-label quantizer. The over-cap branch is additionally
  * validated cross-engine (oracle hash-match at 12k and, gate-side, at
  * 20k vectors — BASELINE.md r14); these pins cover the derivation
  * arithmetic and the split's semantics.
  */
class SemDedupValveSpec extends SparkSuite with Matchers {

  test("split width derives from corpus size by integer doubling") {
    Similarity.semBits(0L) shouldBe 0
    Similarity.semBits(10000L) shouldBe 0 // at the cap: no split
    Similarity.semBits(10001L) shouldBe 1
    Similarity.semBits(20000L) shouldBe 1
    Similarity.semBits(20001L) shouldBe 2
    Similarity.semBits(40000L) shouldBe 2
    Similarity.semBits(1000000000L) shouldBe Similarity.SemMaxBits
  }

  /** 12k corpus: sf0.001-shaped clusters, deterministic, over the cap.
    * Vectors are full [[HyperplaneLsh.Dim]]-dimensional (ADVICE r14: the
    * original 16-dim fixture made every hyperplane dot NULL→0, so the
    * split tests passed vacuously with sub ≡ 0).
    */
  private val D = HyperplaneLsh.Dim
  private def corpus: DataFrame = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(10, D)(rnd.nextGaussian())
    val rows = (0L until 12000L).map { id =>
      val lab = (id % 10).toInt
      val v = Array.tabulate(D)(d =>
        (centers(lab)(d) + 0.3 * rnd.nextGaussian()).toFloat)
      (id, v, lab)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("bits=1 actually splits: the corpus lands on both plane sides") {
    import spark.implicits._
    // guards the guard: if the hyperplane machinery ever degenerates to a
    // constant sub again (the ADVICE r14 dim-mismatch failure mode), this
    // fails instead of letting the superset/dedup pins pass vacuously
    val subs = Similarity.semdedupSubs(spark, corpus, 1)
      .select($"sub").distinct().collect().map(_.getLong(0)).toSet
    subs shouldBe Set(0L, 1L)
  }

  test("splitting only removes comparisons: refined keeps ⊇ coarse keeps") {
    import spark.implicits._
    val emb = corpus.cache()
    val coarse = Similarity.semdedupWithBits(spark, emb, 0)
      .filter($"keep").select($"vec_id").cache()
    val refined = Similarity.semdedupWithBits(spark, emb, 1)
      .filter($"keep").select($"vec_id").cache()
    // an anchor pair must share (cluster, sub); splitting can only break
    // pairs, never create them — every coarse keep survives refinement
    coarse.join(refined, Seq("vec_id"), "left_anti").count() shouldBe 0L
    refined.count() should be >= coarse.count()
    info(s"keeps: coarse=${coarse.count()} refined(bits=1)=${refined.count()}")
  }

  test("an exact duplicate is still deduplicated through the split") {
    import spark.implicits._
    // identical vectors get identical sign bits, so the pair can never be
    // separated by the split — the dedup contract survives any valve width
    val base = corpus
    val dup = base.filter($"vec_id" === 7L)
      .select(($"vec_id" + 13000L).as("vec_id"), $"embedding", $"label")
    val out = Similarity.semdedupOf(spark, base.union(dup)) // 12001 vecs → bits=1
    val r = out.filter($"vec_id" === 13007L).collect().head
    r.getBoolean(2) shouldBe false // keep = false: anchored
  }
}
