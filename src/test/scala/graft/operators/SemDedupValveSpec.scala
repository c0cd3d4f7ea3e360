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

  /** A VERY TIGHT cluster (spread 0.01 ≪ hyperplane scale) planted so the
    * documented valve caveat actually fires: every member lies on the
    * same side of each salted plane, so the hyperplane sub-split leaves
    * the cell whole — the geometry-blind failure the deep re-quantize
    * fallback (VERDICT r14 #5) exists for.
    */
  private def tightCorpus: DataFrame = {
    val rnd = new scala.util.Random(23)
    val center = Array.fill(D)(rnd.nextGaussian())
    val rows = (0L until 120L).map { id =>
      val v = Array.tabulate(D)(d => (center(d) + 0.01 * rnd.nextGaussian()).toFloat)
      (id, v, 0L)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("fallback no-ops when nothing overflows: balanced == hyperplane form, row-identical") {
    import spark.implicits._
    val emb = corpus.cache()
    val plain = Similarity.semdedupWithBits(spark, emb, 1)
      .orderBy($"vec_id").collect().toSeq
    // cap far above every cell: overCells is empty, the deep branch is
    // dead code, and the result must be the oracle-checked form exactly
    val balanced = Similarity.semdedupBalanced(spark, emb, 1, cap = 1000000L)
      .orderBy($"vec_id").collect().toSeq
    balanced shouldBe plain
  }

  test("tight over-cap cluster: hyperplanes leave it whole, the deep re-quantize bounds it") {
    import spark.implicits._
    val emb = tightCorpus.cache()
    // (a) the caveat is real here: every sub bit identical → one cell
    Similarity.semdedupSubs(spark, emb, Similarity.SemMaxBits)
      .select($"sub").distinct().count() shouldBe 1L
    // (b) the geometry-aware fallback splits what the hyperplanes cannot:
    // with cap = 40, the 120-member cell must end in cells ≤ the largest
    // init-group-rebalanced child (the means differ along the cluster's
    // own spread, so members spread over the children)
    val cells = Similarity.semBalancedCells(spark, emb, Similarity.SemMaxBits, cap = 40L)
      .groupBy($"cluster", $"cell").count().cache()
    cells.count() should be > 1L
    val maxCell = cells.agg(org.apache.spark.sql.functions.max($"count"))
      .collect().head.getLong(0)
    info(s"cells after deep split: ${cells.count()}, largest = $maxCell (was 120)")
    maxCell should be < 120L
    // the quadratic bill actually shrank: Σ nₖ² < n²
    val sumSq = cells.select(($"count" * $"count").as("sq"))
      .agg(org.apache.spark.sql.functions.sum($"sq")).collect().head.getLong(0)
    sumSq should be < 120L * 120L
  }

  test("deep split keeps the dedup contract: same-group duplicate still anchored, keeps ⊇ unsplit") {
    import spark.implicits._
    val base = tightCorpus
    // duplicate of vec 7 at id 7 + 8k (same vec_id % SemDeepK init group,
    // identical vector → identical child assignment → still compared)
    val dup = base.filter($"vec_id" === 7L)
      .select(org.apache.spark.sql.functions.lit(127L).as("vec_id"),
        $"embedding", $"label")
    val dupId = 127L
    (dupId % Similarity.SemDeepK) shouldBe 7L
    val all = base.union(dup).cache()
    val out = Similarity.semdedupBalanced(spark, all, Similarity.SemMaxBits, cap = 40L).cache()
    out.filter($"vec_id" === dupId).collect().head.getBoolean(2) shouldBe false
    // splitting only removes compare pairs: every unsplit keep survives
    val unsplitKeeps = Similarity.semdedupWithBits(spark, all, Similarity.SemMaxBits)
      .filter($"keep").select($"vec_id")
    unsplitKeeps.join(out.filter($"keep").select($"vec_id"),
      Seq("vec_id"), "left_anti").count() shouldBe 0L
  }
}
