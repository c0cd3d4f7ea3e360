package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.QueryDef.sqlChecked
import graft.functions.Exprs

/** GRAPH-BASED ANN (the HNSW family — Malkov & Yashunin 2016; NSW, Malkov
  * et al. 2014): the dominant published ANN regime next to the repo's
  * IVF / PQ / LSH / random-projection paths, and the standard
  * ann-benchmarks comparison point. A navigable proximity graph is built
  * over the corpus; a query greedily walks it from a fixed entry point,
  * then beam-searches the base layer; only visited nodes are scored.
  *
  * This implementation is the DETERMINISTIC, ORACLE-REPLAYABLE member of
  * the family (the pr_pagerank / ta_bpe_train trajectory-unroll
  * discipline): every stochastic ingredient of published HNSW is replaced
  * by a deterministic twin so DuckDB can re-derive the exact build AND
  * search from scratch in SQL:
  *
  *  - random insertion order / random level draws → arithmetic level
  *    assignment: node `vec_id` is promoted to the upper layer iff
  *    `(vec_id DIV shards) % HnswPromote == 0` (every 8th member — id
  *    order is independent of geometry, which is what the random draw
  *    buys);
  *  - incremental neighbor selection → the exact M-NN graph per layer
  *    (directed, 6-dp-rounded cosine, ties by id) — the NN-descent /
  *    KGraph build target;
  *  - unbounded best-first search → a FIXED unroll: HnswGreedyHops greedy
  *    steps on the upper layer, then HnswBeamHops beam steps (width
  *    HnswBeam) on the base layer. Fixed depth makes the walk a finite
  *    CTE chain instead of a data-dependent loop.
  *
  * SCALE SHAPE (the 100 TB story, and why the build is PARTITION-LOCAL):
  * the corpus is sharded by `vec_id % HnswShards`; each shard builds its
  * own graph INDEPENDENTLY (the within-shard M-NN join keys on shard, so
  * shards never exchange vectors) and a query scatter-gathers: search
  * every shard's graph, merge the per-shard visited sets, take the global
  * top-k — the published distributed-HNSW serving pattern (per-shard
  * Faiss-HNSW + result merge). Build cost n²/S per shard against n² flat;
  * at real scale the per-shard exact M-NN build is replaced by NN-descent
  * over the same shard with the serve path unchanged. Two layers suffice
  * at test scale (upper = n/8); the generalization is levels = log_8(n)
  * with the same arithmetic promotion per level (SCALING.md).
  *
  * Searching re-uses the repo's ANN eval discipline: sim_recall_eval
  * grades hnsw and ivf side-by-side against the brute-force truth AND
  * reports each method's measured candidate budget (n_cand = distinct
  * scored nodes), so the recall-per-candidate trade is a measured number,
  * not a claim. HnswRecallSpec pins the structural invariants and the
  * drift scenario where graphs beat IVF at equal budget.
  */
object GraphAnn {

  /** All `final val` literals: interpolated into oracle SQL at object init
    * (init-order-safe) and exposed for HnswRecallSpec.
    */
  final val HnswShards = 4
  final val HnswPromote = 8
  final val HnswM0 = 6
  final val HnswM1 = 16
  final val HnswBeam = 4
  final val HnswGreedyHops = 2
  final val HnswBeamHops = 3
  final val HnswQueryMax = 5
  final val HnswK = 10

  /** Nodes with search geometry: double vector, norm, shard, upper-layer
    * flag. Takes any (vec_id, embedding) frame so specs can plant corpora.
    */
  def hnswNodes(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), Exprs.vecAsDouble(col("embedding")).as("v"))
      .withColumn("nrm", Exprs.l2norm(col("v")))
      .withColumn("shard", col("vec_id") % HnswShards)
      .withColumn("top", expr(s"(vec_id DIV $HnswShards) % $HnswPromote = 0"))

  /** Directed exact M-NN edges WITHIN each shard (the layer graph). The
    * join keys on shard, so the build is partition-local: every shard's
    * edge list derives from that shard's vectors only.
    */
  def knnEdges(members: DataFrame, m: Int): DataFrame = {
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst").asc)
    members.as("a")
      .join(members.as("b"),
        col("a.shard") === col("b.shard") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.shard").as("shard"), col("a.vec_id").as("src"),
        col("b.vec_id").as("dst"),
        round(Exprs.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 6)
          .as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= m)
      .select("shard", "src", "dst")
  }

  /** The full scatter-gather search: every scored (query, node) visit
    * across all shards, deduped — (query_id, node, cos). n_cand in
    * sim_recall_eval is exactly this set's per-query size: the measured
    * candidate budget (distance computations paid). Queries are the
    * corpus members with vec_id < HnswQueryMax, like every sim_ query.
    */
  def hnswSearch(s: SparkSession, emb: DataFrame): DataFrame = {
    import s.implicits._
    // localCheckpoint (eager) after every build/walk step: with plain
    // cache() the final action's task binaries carry the WHOLE chained
    // lineage (measured 13.5 MiB broadcasts and an 18 s wall at 2 000
    // vectors — pure plan/codegen overhead); truncating collapses each
    // step to a scan of materialized rows and the search to ~2 s
    val nodes = hnswNodes(emb).localCheckpoint()
    val e0 = knnEdges(nodes, HnswM0).localCheckpoint()
    val e1 = knnEdges(nodes.filter($"top"), HnswM1).localCheckpoint()
    hnswWalk(s, nodes, e0, e1)
  }

  /** The walk alone, over an already-materialized index (nodes + the two
    * layer edge lists) — shared by the fused build+search path above and
    * the persisted-index serve (sim_hnsw_persist).
    */
  def hnswWalk(s: SparkSession, nodes: DataFrame, e0: DataFrame,
      e1: DataFrame): DataFrame = {
    import s.implicits._
    val entries = nodes.filter($"top")
      .groupBy($"shard").agg(min($"vec_id").as("entry"))
    val q = nodes.filter($"vec_id" < HnswQueryMax)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    def score(cand: DataFrame): DataFrame =
      cand.select("query_id", "shard", "node")
        .join(nodes.select($"vec_id".as("node"), $"v".as("nv"), $"nrm".as("nnrm")),
          Seq("node"))
        .join(broadcast(q), Seq("query_id"))
        .select($"query_id", $"shard", $"node",
          round(Exprs.dot($"qv", $"nv") / ($"qnrm" * $"nnrm"), 6).as("cos"))
    val wSel = Window.partitionBy($"query_id", $"shard")
      .orderBy($"cos".desc, $"node".asc)
    // entry: each query scores every shard's fixed entry point
    var state = score(q.select($"query_id").crossJoin(broadcast(entries))
      .select($"query_id", $"shard", $"entry".as("node"))).localCheckpoint()
    var scoredSets = Seq(state)
    // greedy descent on the upper layer (beam 1): move to the best of
    // {current} ∪ neighbors each hop
    for (_ <- 1 to HnswGreedyHops) {
      val nb = state.as("g").join(e1.as("e"),
          $"g.shard" === $"e.shard" && $"g.node" === $"e.src")
        .select($"g.query_id".as("query_id"), $"g.shard".as("shard"),
          $"e.dst".as("node"))
        .distinct()
      val sc = score(nb).localCheckpoint()
      scoredSets :+= sc
      state = state.select($"query_id", $"shard", $"node", $"cos")
        .union(sc).distinct()
        .withColumn("rk", row_number().over(wSel)).filter($"rk" === 1)
        .select($"query_id", $"shard", $"node", $"cos").localCheckpoint()
    }
    // beam search on the base layer: expand all beam members' neighbors,
    // keep the HnswBeam best of {beam} ∪ {expansion}
    for (_ <- 1 to HnswBeamHops) {
      val nb = state.as("b").join(e0.as("e"),
          $"b.shard" === $"e.shard" && $"b.node" === $"e.src")
        .select($"b.query_id".as("query_id"), $"b.shard".as("shard"),
          $"e.dst".as("node"))
        .distinct()
      val sc = score(nb).localCheckpoint()
      scoredSets :+= sc
      state = state.select($"query_id", $"shard", $"node", $"cos")
        .union(sc).distinct()
        .withColumn("rk", row_number().over(wSel)).filter($"rk" <= HnswBeam)
        .select($"query_id", $"shard", $"node", $"cos").localCheckpoint()
    }
    scoredSets.map(_.select($"query_id", $"node", $"cos"))
      .reduce(_ union _).distinct()
  }

  /** Global top-k merge over an already-computed visited set — exposed so
    * sim_recall_eval pays for ONE search and derives both the top-k and
    * the candidate budget from it.
    */
  def hnswTopkFrom(vis: DataFrame, k: Int = HnswK): DataFrame = {
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("node").asc)
    vis.filter(col("node") =!= col("query_id"))
      .withColumn("rk", row_number().over(wq)).filter(col("rk") <= k)
      .select(col("query_id"), col("node").as("cand_id"), col("cos"),
        col("rk").cast("long").as("rk"))
  }

  /** Global top-k merge over the per-shard visited sets (self excluded). */
  def hnswTopk(s: SparkSession, emb: DataFrame, k: Int = HnswK): DataFrame =
    hnswTopkFrom(hnswSearch(s, emb), k)

  /** IVF candidate set over an arbitrary (vec_id, embedding, label) frame
    * with adjustable nprobe — HnswRecallSpec's comparison harness: the spec
    * RAISES nprobe until IVF's measured budget covers HNSW's, so "graph
    * beats IVF" is asserted at equal-or-greater IVF budget, never by
    * starving the baseline.
    */
  def ivfCandidatesOf(
      s: SparkSession, emb: DataFrame, nprobe: Int): DataFrame = {
    import s.implicits._
    val e = emb
      .select($"vec_id", Exprs.vecAsDouble($"embedding").as("v"))
      .withColumn("nrm", Exprs.l2norm($"v"))
    val centroids = Similarity.centroidsOf(s, emb)
    val assigned = Similarity.ivfAssigned(e, centroids)
    val probes = e.filter($"vec_id" < HnswQueryMax)
      .crossJoin(broadcast(centroids))
      .select($"vec_id".as("query_id"), $"label",
        round(Exprs.dot($"v", $"c") / ($"nrm" * $"cnrm"), 6).as("ccos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"query_id").orderBy($"ccos".desc, $"label".asc)))
      .filter($"rk" <= nprobe)
      .select($"query_id", $"label".as("cluster"))
    broadcast(probes)
      .join(assigned, Seq("cluster"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("cand_id"))
  }

  private def scoreSql(qv: String, cv: String, qn: String, cn: String): String =
    s"round(list_sum(list_transform(generate_series(1, len($qv)), i -> $qv[i] * $cv[i])) / ($qn * $cn), 6)"

  /** The shared v/n scan prefix (same text as every sim_ oracle). */
  final val VnSql: String =
    """v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM v)""".stripMargin

  /** Build + search replayed as oracle CTEs. Assumes CTEs v, n (vec_id, v,
    * nrm) are already defined; ends in `hvis` (all scored visits) and
    * `hnsw_topk` (query_id, cand_id, cos, rk ≤ HnswK).
    */
  val HnswCtesSql: String = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    parts += s"""hn AS (SELECT vec_id, v, nrm, vec_id % $HnswShards AS shard,
      |  ((vec_id // $HnswShards) % $HnswPromote = 0) AS top FROM n)""".stripMargin
    parts += s"""he0 AS (SELECT shard, src, dst FROM (
      |  SELECT a.shard AS shard, a.vec_id AS src, b.vec_id AS dst,
      |    row_number() OVER (PARTITION BY a.vec_id
      |      ORDER BY ${scoreSql("a.v", "b.v", "a.nrm", "b.nrm")} DESC, b.vec_id) AS rk
      |  FROM hn a JOIN hn b ON a.shard = b.shard AND a.vec_id <> b.vec_id)
      |  WHERE rk <= $HnswM0)""".stripMargin
    parts += s"""he1 AS (SELECT shard, src, dst FROM (
      |  SELECT a.shard AS shard, a.vec_id AS src, b.vec_id AS dst,
      |    row_number() OVER (PARTITION BY a.vec_id
      |      ORDER BY ${scoreSql("a.v", "b.v", "a.nrm", "b.nrm")} DESC, b.vec_id) AS rk
      |  FROM hn a JOIN hn b ON a.shard = b.shard AND a.top AND b.top AND a.vec_id <> b.vec_id)
      |  WHERE rk <= $HnswM1)""".stripMargin
    parts += s"hent AS (SELECT shard, min(vec_id) AS entry FROM hn WHERE top GROUP BY shard)"
    parts += s"hq AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n WHERE vec_id < $HnswQueryMax)"
    parts += s"""hg0 AS (SELECT q.query_id, t.shard, t.entry AS node,
      |  ${scoreSql("q.qv", "c.v", "q.qnrm", "c.nrm")} AS cos
      |  FROM hq q CROSS JOIN hent t JOIN hn c ON c.vec_id = t.entry)""".stripMargin
    for (i <- 1 to HnswGreedyHops) {
      parts += s"""hs$i AS (SELECT DISTINCT g.query_id, g.shard, e.dst AS node
        |  FROM hg${i - 1} g JOIN he1 e ON e.shard = g.shard AND e.src = g.node)""".stripMargin
      parts += s"""hc$i AS (SELECT s.query_id, s.shard, s.node,
        |  ${scoreSql("q.qv", "c.v", "q.qnrm", "c.nrm")} AS cos
        |  FROM hs$i s JOIN hq q ON q.query_id = s.query_id JOIN hn c ON c.vec_id = s.node)""".stripMargin
      parts += s"""hg$i AS (SELECT query_id, shard, node, cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id, shard
        |    ORDER BY cos DESC, node) AS rk
        |  FROM (SELECT * FROM hg${i - 1} UNION SELECT * FROM hc$i)) WHERE rk = 1)""".stripMargin
    }
    parts += s"hb0 AS (SELECT * FROM hg$HnswGreedyHops)"
    for (i <- 1 to HnswBeamHops) {
      parts += s"""hx$i AS (SELECT DISTINCT b.query_id, b.shard, e.dst AS node
        |  FROM hb${i - 1} b JOIN he0 e ON e.shard = b.shard AND e.src = b.node)""".stripMargin
      parts += s"""hw$i AS (SELECT s.query_id, s.shard, s.node,
        |  ${scoreSql("q.qv", "c.v", "q.qnrm", "c.nrm")} AS cos
        |  FROM hx$i s JOIN hq q ON q.query_id = s.query_id JOIN hn c ON c.vec_id = s.node)""".stripMargin
      parts += s"""hb$i AS (SELECT query_id, shard, node, cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id, shard
        |    ORDER BY cos DESC, node) AS rk
        |  FROM (SELECT * FROM hb${i - 1} UNION SELECT * FROM hw$i)) WHERE rk <= $HnswBeam)""".stripMargin
    }
    val scoredSets = Seq("hg0") ++
      (1 to HnswGreedyHops).map(i => s"hc$i") ++
      (1 to HnswBeamHops).map(i => s"hw$i")
    parts += s"""hvis AS (SELECT DISTINCT query_id, node, cos FROM (
      |  ${scoredSets.map(t => s"SELECT query_id, shard, node, cos FROM $t").mkString("\n  UNION ALL ")}))""".stripMargin
    parts += s"""hnsw_topk AS (SELECT query_id, node AS cand_id, cos, rk FROM (
      |  SELECT query_id, node, cos,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, node) AS rk
      |  FROM hvis WHERE node <> query_id) WHERE rk <= $HnswK)""".stripMargin
    parts.mkString(",\n")
  }

  /** Write-once-per-(dir, JVM) PERSISTED GRAPH INDEX (the ivfIndexDir
    * discipline for the HNSW family): `nodes/` plus the two layer edge
    * lists as parquet PARTITIONED BY shard — the long-lived serving form,
    * where the n²/S build amortizes over every query batch and an
    * executor serving shard k reads only `edges0/shard=k`. Removed on JVM
    * exit.
    */
  private val hnswIndexDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def hnswIndexDir(s: SparkSession, dir: String): String =
    hnswIndexDirs.getOrElseUpdate(dir, graft.ColdBuilds.timed("sim_hnsw_persist", dir) {
      import s.implicits._
      val p = java.nio.file.Files
        .createTempDirectory("graft-hnsw-index").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete()
        }
        rm(new java.io.File(p))
      }))
      val nodes = hnswNodes(Tables.embeddings(s, dir)).localCheckpoint()
      nodes.write.mode("overwrite").parquet(s"$p/nodes")
      knnEdges(nodes, HnswM0)
        .write.mode("overwrite").partitionBy("shard").parquet(s"$p/edges0")
      knnEdges(nodes.filter($"top"), HnswM1)
        .write.mode("overwrite").partitionBy("shard").parquet(s"$p/edges1")
      p
    })

  val defs: Seq[QueryDef] = Seq(

    // Graph-ANN top-k: sharded 2-layer NSW build + greedy/beam search +
    // per-shard visited-set merge, fully replayed by the oracle (see the
    // object scaladoc for the determinism contract and the scale shape).
    sqlChecked(
      "sim_hnsw_topk",
      s"""WITH $VnSql,
        |$HnswCtesSql
        |SELECT query_id, cand_id, cos, rk FROM hnsw_topk
        |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      import s.implicits._
      graft.QueryDef.smallSort(
        hnswTopk(s, Tables.embeddings(s, dir)), $"query_id", $"rk")
    },

    // The PERSISTED-index twin (the sim_ivf_persist discipline): the graph
    // is built ONCE into shard-partitioned parquet; this query serves a
    // batch by walking the stored edge lists. Same deterministic build ⇒
    // the same oracle as sim_hnsw_topk must hold verbatim.
    sqlChecked(
      "sim_hnsw_persist",
      s"""WITH $VnSql,
        |$HnswCtesSql
        |SELECT query_id, cand_id, cos, rk FROM hnsw_topk
        |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      import s.implicits._
      val idx = hnswIndexDir(s, dir)
      val vis = hnswWalk(s,
        s.read.parquet(s"$idx/nodes"),
        s.read.parquet(s"$idx/edges0").select("shard", "src", "dst"),
        s.read.parquet(s"$idx/edges1").select("shard", "src", "dst"))
      graft.QueryDef.smallSort(hnswTopkFrom(vis), $"query_id", $"rk")
    }
  )
}
