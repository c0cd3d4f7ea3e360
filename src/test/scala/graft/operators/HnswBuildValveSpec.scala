package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for the BUILD-MODE VALVE on the long-lived graph indexes
  * (VERDICT r14 #1: `hnswIndexDir` / `hnswIncrIndexDir` built with the
  * exact O(n²/S) join unconditionally — the one place the
  * measured-infeasible build was still mandatory). The valve: exact M-NN
  * at-or-under [[GraphAnn.NndBuildCap]] vectors, NN-descent above, the
  * semBits / exact-pairs-gate discipline with the cap parameterized so
  * the spec exercises BOTH modes and the boundary on a planted corpus.
  *
  * The at-scale claims pinned here:
  *  - the flip point is exactly `n > cap` (shared by the Spark builds and
  *    the oracle SQL's count(*) gates — one definition, [[GraphAnn.nndBuildMode]]);
  *  - at the boundary (n == cap) the valved build is BYTE-IDENTICAL to
  *    the exact build, and one vector past it the valved build is
  *    byte-identical to the NN-descent build — no third behavior exists;
  *  - the SERVE path is mode-agnostic machinery: walking a stored index
  *    built in either mode equals walking the equivalent in-memory edge
  *    lists (so flipping the valve can never change what a query batch
  *    pays at serve time, only what the build paid);
  *  - the incremental index's base layer obeys the same valve while its
  *    arrival insert stays exact (arrival-sized, never the quadratic
  *    term).
  */
class HnswBuildValveSpec extends SparkSuite with Matchers {

  private val C = 21
  private val M = 12
  private val D = 64

  /** The HnswRecallSpec / HnswNndSpec clustered fixture (same constants,
    * same seed): tight gaussian clusters, ids interleaved across shards.
    */
  private def fixture: DataFrame = {
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(C, D)(rnd.nextGaussian())
    val rows = for (j <- 0 until C; m <- 0 until M) yield {
      val id = (m * C + j).toLong
      val v = Array.tabulate(D)(d => (centers(j)(d) + 0.15 * rnd.nextGaussian()).toFloat)
      (id, v, id / C % 10)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  private def edgeSet(e: DataFrame): Set[(Long, Long, Long)] =
    e.select("shard", "src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("flip point: exact at the cap, descent one vector past it") {
    GraphAnn.nndBuildMode(GraphAnn.NndBuildCap) shouldBe false
    GraphAnn.nndBuildMode(GraphAnn.NndBuildCap + 1) shouldBe true
    // parameterized form (what the spec's planted corpora use)
    GraphAnn.nndBuildMode(100, cap = 100) shouldBe false
    GraphAnn.nndBuildMode(101, cap = 100) shouldBe true
  }

  test("valved base edges: exact at the boundary, descent past it, nothing else") {
    val nodes = GraphAnn.hnswNodes(fixture).localCheckpoint()
    val n = nodes.count()
    val exact = edgeSet(GraphAnn.knnEdges(nodes, GraphAnn.HnswM0))
    val descent = edgeSet(GraphAnn.nndEdges(spark, nodes))
    // boundary: n == cap stays exact; n == cap + 1 flips to descent
    edgeSet(GraphAnn.valvedBaseEdges(spark, nodes, n, cap = n)) shouldBe exact
    edgeSet(GraphAnn.valvedBaseEdges(spark, nodes, n, cap = n - 1)) shouldBe descent
    // (on this 63-member-per-shard fixture descent CONVERGES to the exact
    // graph — 3 rounds of (2·NndBuildM)² candidates cover every shard, so
    // exact == descent here is correct, not vacuous; the modes-differ
    // non-degeneracy pin lives in the next test at a shard size the
    // rounds cannot cover)
  }

  test("non-degeneracy: at uncoverable shard sizes the two modes build different graphs") {
    import spark.implicits._
    // 2 000 weakly-clustered vectors → 500/shard: 3 descent rounds see a
    // bounded candidate neighborhood, not the whole shard, so the descent
    // graph approximates (not equals) the exact M-NN graph — the regime
    // the valve exists for
    val rnd = new scala.util.Random(7)
    val emb = (0 until 2000).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat), i % 10L)
    }.toDF("vec_id", "embedding", "label")
    val nodes = GraphAnn.hnswNodes(emb).localCheckpoint()
    val exact = edgeSet(GraphAnn.knnEdges(nodes, GraphAnn.HnswM0))
    val descent = edgeSet(GraphAnn.nndEdges(spark, nodes))
    exact should not be descent
    // ...but descent still finds most of the true graph (the hash-init
    // convergence claim at the scale where it matters)
    val overlap = (exact & descent).size.toDouble / exact.size
    info(f"edge overlap at 500/shard: $overlap%.3f")
    overlap should be >= 0.5
  }

  test("persisted path: both modes build through writeHnswIndex, serve is mode-agnostic") {
    import spark.implicits._
    val emb = fixture.cache()
    val nodes = GraphAnn.hnswNodes(emb).localCheckpoint()
    val n = nodes.count()
    val uppers = GraphAnn.upperEdgesOf(nodes)

    def storedTopk(cap: Long): (Boolean, Seq[org.apache.spark.sql.Row]) = {
      val p = java.nio.file.Files.createTempDirectory("graft-valve-spec").toString
      val mode = GraphAnn.writeHnswIndex(spark, emb, p, cap)
      val top = GraphAnn.hnswTopkFrom(GraphAnn.hnswWalkStored(spark, p))
        .orderBy($"query_id", $"rk").collect().toSeq
      (mode, top)
    }
    def memTopk(base: DataFrame): Seq[org.apache.spark.sql.Row] =
      GraphAnn.hnswTopkFrom(GraphAnn.hnswWalk(spark, nodes, base, uppers))
        .orderBy($"query_id", $"rk").collect().toSeq

    val (modeExact, servedExact) = storedTopk(cap = n)
    val (modeNnd, servedNnd) = storedTopk(cap = n - 1)
    modeExact shouldBe false
    modeNnd shouldBe true
    // serve-equality: the stored walk reproduces the in-memory walk over
    // the same mode's edge lists — the walk machinery never branches on
    // how the lists were built
    servedExact shouldBe memTopk(GraphAnn.knnEdges(nodes, GraphAnn.HnswM0))
    servedNnd shouldBe memTopk(GraphAnn.nndEdges(spark, nodes))
  }

  test("upper layers valve independently: a layer over the cap builds by descent, one under it stays exact") {
    import spark.implicits._
    // a PROMOTION-DENSE corpus: vec_id = 32·i + i%4 puts all 2 000
    // vectors at layer ≥ 1 (500 per shard — the uncoverable regime where
    // descent ≠ exact) while layer 2 keeps 250 members. cap = 300 puts
    // the base (2 000) AND layer 1 (2 000) over the cap while layer 2
    // (250) stays under — the r15 residual scenario (VERDICT #2: layer 1
    // crosses the same cap the base is valved on at ~8·cap vectors)
    val rnd = new scala.util.Random(7)
    val emb = (0 until 2000).map { i =>
      (32L * i + i % 4, Array.fill(16)(rnd.nextGaussian().toFloat), i % 10L)
    }.toDF("vec_id", "embedding", "label")
    val nodes = GraphAnn.hnswNodes(emb).localCheckpoint()
    val st = GraphAnn.ladderStats(nodes)
    val cap = 300L
    st.members(1) shouldBe 2000L
    st.members(1) should be > cap
    st.members(2) should be <= cap
    val p = java.nio.file.Files.createTempDirectory("graft-valve-upper").toString
    GraphAnn.writeHnswIndex(spark, emb, p, cap) shouldBe true
    val stored = spark.read.parquet(s"$p/edges")
      .select($"src", $"dst", $"lvl".cast("int").as("lvl"),
        $"shard".cast("long").as("shard"))
    def at(l: Int) = stored.filter($"lvl" === l).select("shard", "src", "dst")
    val l1Members = nodes.filter($"lvl" >= 1).localCheckpoint()
    val l2Members = nodes.filter($"lvl" >= 2).localCheckpoint()
    edgeSet(at(1)) shouldBe
      edgeSet(GraphAnn.nndEdges(spark, l1Members, GraphAnn.HnswM1))
    edgeSet(at(2)) shouldBe
      edgeSet(GraphAnn.knnEdges(l2Members, GraphAnn.HnswM1))
    // NON-VACUITY at the base layer of the SAME index: 500/shard at build
    // degree 2·M0 = 12 is the proven divergent regime (the non-degeneracy
    // test above), so descent ≠ exact there — the index demonstrably came
    // out of the descent branch. (Layer 1's descent at build degree
    // 2·M1 = 32 CONVERGES to the exact graph at 500/shard — reach 64²
    // covers the shard — so edge inequality cannot pin the mode there;
    // the equality-to-nndEdges pins above are the per-layer dispatch
    // check, and convergence means the valve costs no edge quality at
    // any layer size the reach covers.)
    edgeSet(at(0)) should not be
      edgeSet(GraphAnn.knnEdges(nodes, GraphAnn.HnswM0))
    edgeSet(at(0)) shouldBe edgeSet(GraphAnn.nndEdges(spark, nodes))
  }

  test("stored-index arrival insert equals the rebuild-from-union insert semantics, both modes") {
    import spark.implicits._
    // the pipeline's incremental ANN face (VERDICT r15 #6): base index on
    // disk, arrivals inserted arrival-proportionally (touched-list
    // re-prunes + verbatim pass-through) must equal incrMergedEdges on
    // the union — checked in exact mode AND with the valve forced to
    // descent (cap = 100)
    val rnd = new scala.util.Random(11)
    val emb = (0 until 1500).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat), i % 10L)
    }.toDF("vec_id", "embedding", "label").cache()
    val baseEmb = emb.filter(!GraphAnn.incrArrival($"vec_id"))
    val arrEmb = emb.filter(GraphAnn.incrArrival($"vec_id"))
    val allNodes = GraphAnn.hnswNodes(emb).localCheckpoint()
    for (cap <- Seq(GraphAnn.NndBuildCap, 100L)) {
      val baseP = java.nio.file.Files
        .createTempDirectory("graft-insert-base").toString
      GraphAnn.writeHnswIndex(spark, baseEmb, baseP, cap)
      val updP = java.nio.file.Files
        .createTempDirectory("graft-insert-upd").toString
      GraphAnn.insertIntoStoredIndex(spark,
        baseP, GraphAnn.hnswNodes(arrEmb).localCheckpoint(), updP, cap)
      val ref = GraphAnn.incrMergedEdges(spark, allNodes, cap)
      val upd = spark.read.parquet(s"$updP/edges")
        .select($"src", $"dst", $"lvl".cast("int").as("lvl"),
          $"shard".cast("long").as("shard"))
      upd.select($"lvl").distinct().collect().map(_.getInt(0)).toSet shouldBe
        ref.keySet
      for ((l, e) <- ref)
        edgeSet(upd.filter($"lvl" === l).select("shard", "src", "dst")) shouldBe
          edgeSet(e)
    }
  }

  test("incremental index: base layer valved, merged lists stay degree-bounded in descent mode") {
    import spark.implicits._
    val nodes = GraphAnn.hnswNodes(fixture).localCheckpoint()
    val mod = GraphAnn.HnswIncrMod; val res = GraphAnn.HnswIncrRes
    val base = nodes.filter($"vec_id" % mod =!= res)
    val nBase = base.count()
    // cap below the base count ⇒ the base graph comes from NN-descent
    val merged = GraphAnn.incrMergedEdges(spark, nodes, cap = nBase - 1)
    val m0 = merged(0)
    // replay: descent base ∪ exact forward links ∪ back-links, re-pruned —
    // exactly what the valved build must have merged
    val arr = nodes.filter($"vec_id" % mod === res)
    val fwd = GraphAnn.knnEdgesBetween(arr, base, GraphAnn.HnswM0)
    val rev = fwd.select($"shard", $"dst".as("src"), $"src".as("dst"))
    val want = GraphAnn.rerankEdges(nodes,
      GraphAnn.nndEdges(spark, base).union(fwd).union(rev), GraphAnn.HnswM0)
    edgeSet(m0) shouldBe edgeSet(want)
    // degree/partition invariants hold in descent mode too
    m0.filter($"src" % GraphAnn.HnswShards =!= $"dst" % GraphAnn.HnswShards)
      .count() shouldBe 0L
    m0.groupBy($"src").count()
      .filter($"count" > GraphAnn.HnswM0).count() shouldBe 0L
  }
}
