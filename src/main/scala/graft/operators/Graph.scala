package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.QueryDef.sqlChecked

/** Iterative graph dataflow beyond connected components (dd_components):
  * PageRank over the bipartite customer↔part purchase graph derived from
  * orders×lineitem (both directions, so the walk is over the undirected
  * structure and every node has in- and out-edges — no dangling mass).
  *
  * All rank arithmetic is FIXED-POINT integer micro-units (r0 = 1e12 DIV n;
  * share = r DIV deg; next = base + 85·Σshare DIV 100) so five iterations
  * are bit-identical in any engine and under any partitioning — float
  * PageRank is neither (sum order changes the ulps). The DuckDB oracle
  * unrolls the whole trajectory as a generated 5-stage CTE chain (the
  * ta_bpe_train discipline): every intermediate rank vector is pinned, not
  * just the final ordering.
  *
  * Scale shape: the edge list is built once and cached (every iteration
  * reuses it); one iteration = one join of the node-state vector against
  * edges on the source key + one destination-keyed aggregate — two
  * shuffles over fixed-width (node-key, long) rows, never the raw tables.
  * At 100 TB: pre-partition edges by source and the join side of each
  * iteration reuses that partitioning; the rank vector is O(nodes), always
  * ≪ edges. Per-iteration localCheckpoint truncates the 2-joins-per-round
  * lineage (the dd_components lesson — un-truncated growth is exponential
  * in rounds). n (node count) and the derived base term are 1-row driver
  * scalars, the k-means model-collect discipline.
  */
object Graph {

  /** Fixed-point scale: total rank mass in micro-units. */
  val PrScale = 1000000000000L

  /** Damping numerator (d = 0.85 as the integer pair 85/100). */
  val PrDampNum = 85L

  val PrIters = 5

  /** Result size for the presentation top-k. */
  val PrTopK = 30

  def defs: Seq[QueryDef] = Seq(
    sqlChecked("pr_pagerank", pagerankOracleSql) { (s, dir) =>
      import s.implicits._
      val li = Tables.lineitem(s, dir).select($"l_orderkey", $"l_partkey")
      val ord = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
      val cp = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .select(concat(lit("c:"), $"o_custkey").as("a"),
          concat(lit("p:"), $"l_partkey").as("b"))
        .distinct()
      pagerank(cp)
        .orderBy($"rank_micro".desc, $"node")
        .limit(PrTopK)
    })

  /** Five fixed-point PageRank iterations over the undirected closure of
    * `pairs` (a, b): returns (node, rank_micro). Exposed for PageRankSpec.
    */
  def pagerank(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    // undirected: materialize both directions once, PRE-PARTITIONED on the
    // source key and cached — the cached InMemoryRelation keeps
    // hashpartitioning(a), so each iteration's join against the rank
    // vector shuffles only the O(nodes) state side, never the edge list
    // (the big side moves once for the whole run, not once per round)
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("a"))
      .cache()
    val deg = edges.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg")).cache()
    val n = deg.count() // 1-row driver scalar (model-collect discipline)
    val r0 = PrScale / n
    val base = 15L * r0 / 100L // (1 - d) · r0, in integer micro-units
    var ranks = deg.select(col("node"), lit(r0).as("r"))
    for (_ <- 1 to PrIters) {
      val shares = ranks.join(deg, "node")
        .select(col("node"), expr("r DIV deg").as("share"))
      val incoming = edges.join(shares, edges("a") === shares("node"))
        .groupBy(edges("b").as("node"))
        .agg(sum(col("share")).as("acc"))
      ranks = incoming
        .select(col("node"),
          (lit(base) + expr(s"$PrDampNum * acc DIV 100")).as("r"))
        .localCheckpoint() // truncate the per-round 2-join lineage
    }
    // safe to drop now: every iteration ran eagerly (localCheckpoint), and
    // the returned frame reads only the final checkpointed vector
    edges.unpersist()
    deg.unpersist()
    ranks.select(col("node"), col("r").as("rank_micro"))
  }

  /** The identical fixed-point trajectory unrolled as a DuckDB CTE chain. */
  private def pagerankOracleSql: String = {
    val iters = (1 to PrIters).map { k =>
      s"""r$k AS (
         |  SELECT d.node, d.deg,
         |    (15 * (SELECT r0 FROM params) // 100) + $PrDampNum * s.acc // 100 AS r
         |  FROM deg d JOIN (
         |    SELECT e.b AS node, CAST(sum(r.r // r.deg) AS BIGINT) AS acc
         |    FROM edges e JOIN r${k - 1} r ON e.a = r.node GROUP BY e.b) s
         |  ON d.node = s.node)"""
    }.mkString(",\n")
    s"""WITH cp AS (
       |  SELECT DISTINCT 'c:' || o_custkey AS a, 'p:' || l_partkey AS b
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |edges AS (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
       |deg AS (SELECT a AS node, count(*) AS deg FROM edges GROUP BY a),
       |params AS (SELECT $PrScale // count(*) AS r0 FROM deg),
       |r0 AS (SELECT node, deg, (SELECT r0 FROM params) AS r FROM deg),
       |$iters
       |SELECT node, CAST(r AS BIGINT) AS rank_micro FROM r$PrIters
       |ORDER BY rank_micro DESC, node LIMIT $PrTopK""".stripMargin
  }
}
