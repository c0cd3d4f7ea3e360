package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Exprs

/** Random-hyperplane (SimHash-for-vectors) LSH shared by the embedding
  * near-dup and ANN operators.
  *
  * OR-amplification: `L` independent tables of `b` hyperplanes each. A pair
  * with angle θ collides in one table with prob (1-θ/π)^b and in at least one
  * of L tables with prob 1-(1-(1-θ/π)^b)^L.
  *
  * The two consumers want DIFFERENT operating points, so `tables`/`planes`
  * are parameters:
  *
  *  - near-dup ([[graft.operators.Dedup]], b=10, L=24): the target regime is
  *    high-cosine duplicates (cos ≥ 0.85 ⇒ per-table hit ≥ 0.21 ⇒ ≥ 99.6%
  *    recall across 24 tables) while RANDOM pairs collide with
  *    1−(1−2⁻¹⁰)²⁴ ≈ 2.3% — the r05 default (b=4) let random pairs collide
  *    at ≈79%, making the candidate set near-all-pairs on unclustered data
  *    (the suite's second-slowest query);
  *  - top-k ANN ([[graft.operators.Similarity]], b=4, L=24): a k-NN probe
  *    wants a GENEROUS candidate pool (the 10 nearest of 500 random vectors
  *    sit at modest cosines), so coarse buckets are the point, and the
  *    probe side is a handful of query vectors, not n².
  *
  * Scale: each vector maps to exactly L (table, bucket) keys, so candidate
  * generation is an equi-join on a 2-int key — shuffle-partitionable, never
  * all-pairs. On clustered embeddings (the real near-dup case) buckets
  * prune to near-neighbors only; LshRecallSpec pins recall ≥ 0.9 on exactly
  * such a clustered fixture, plus the adversarial random case for ANN.
  *
  * Hyperplane component (p, d) is derived from md5("plane:p:d") — the same
  * portable 60-bit construction as [[Exprs.hash60]], mapped to uniform
  * (-1, 1) — so the planes are not just run-deterministic but ENGINE-
  * reproducible: the DuckDB oracle rebuilds the identical planes, buckets,
  * candidate join, and verification from scratch in SQL (a JVM-RNG plane
  * set can only ever be rows-only checked). Sign-random-projection needs
  * symmetric random directions, not specifically Gaussian ones; uniform
  * cube directions trade a few recall points (re-measured by LshRecallSpec)
  * for full cross-engine verifiability.
  */
object HyperplaneLsh {

  val Dim = 64

  /** ANN operating point (Similarity): coarse buckets, generous candidates. */
  val AnnTables = 24
  val AnnPlanes = 4

  /** Near-dup operating point (Dedup): tight buckets, random-pair collision
    * ≈ 2.3% instead of 79%.
    */
  val DedupTables = 24
  val DedupPlanes = 10

  /** 2^60 — the hash60 range; exact as a double. */
  private val H60Range = (1L << 60).toDouble

  /** JVM twin of Exprs.hash60 for plan-time constants. */
  private def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** md5-derived uniform(-1,1) hyperplanes, identical in Spark and SQL.
    * Sized for the largest consumer (DedupTables × DedupPlanes).
    */
  private lazy val planes: IndexedSeq[IndexedSeq[Double]] =
    IndexedSeq.tabulate(DedupTables * DedupPlanes)(p =>
      IndexedSeq.tabulate(Dim)(d => h60(s"plane:$p:$d").toDouble / H60Range * 2 - 1))

  /** DuckDB CTEs rebuilding the planes and each vector's L (table, bucket)
    * keys from scratch — prepend after a CTE `n(vec_id, v, nrm)` exists.
    */
  def bucketSqlCtes(tables: Int, planesPerTable: Int): String =
    s"""planes AS (
       |  SELECT p, list(w ORDER BY d) AS pv FROM (
       |    SELECT p, d,
       |      CAST(CAST(('0x' || substr(md5('plane:' || CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,15)) AS BIGINT) AS DOUBLE)
       |        / ${H60Range.toLong}.0 * 2 - 1 AS w
       |    FROM (SELECT unnest(generate_series(0, ${tables * planesPerTable - 1})) AS p)
       |    CROSS JOIN (SELECT unnest(generate_series(0, ${Dim - 1})) AS d))
       |  GROUP BY p),
       |dots AS (
       |  SELECT n.vec_id, pl.p,
       |    list_sum(list_transform(generate_series(1, ${Dim}), j -> n.v[j] * pl.pv[j])) AS dp
       |  FROM n CROSS JOIN planes pl),
       |bucketed AS (
       |  SELECT vec_id, (p // ${planesPerTable}) AS t,
       |    SUM(CASE WHEN dp > 0 THEN (1 << (p % ${planesPerTable})) ELSE 0 END) AS bucket
       |  FROM dots GROUP BY vec_id, (p // ${planesPerTable}))""".stripMargin

  private def planeCol(p: Int): Column = array(planes(p).map(lit): _*)

  /** md5-derived plane under an arbitrary salt — consumers outside the LSH
    * tables (the SemDeDup cluster splitter) draw from the same portable
    * family without coupling to the table/plane counts here.
    */
  def saltedPlaneCol(salt: String, p: Int): Column =
    array(saltedPlaneValues(salt, p).map(lit): _*)

  /** JVM-side component VALUES of [[saltedPlaneCol]]'s plane `p` — exposed
    * so a consumer can ship its plane set as DATA (a broadcast plane-per-row
    * frame joined then aggregated, the exact shape of the oracle's plane
    * CTEs) instead of as literal expression trees. A fused projection of
    * many plane dots compiles to one giant generated method that the JIT
    * refuses (measured in the GraphAnn entry-seed path: 2.6 s for 2 000
    * rows × 64 planes — ~100× over the data cost; the join+aggregate form
    * runs the same arithmetic in a small, JIT-compiled loop).
    */
  private[operators] def saltedPlaneValues(salt: String, p: Int): IndexedSeq[Double] =
    IndexedSeq.tabulate(Dim)(d => h60(s"$salt:$p:$d").toDouble / H60Range * 2 - 1)

  /** DuckDB CTE rebuilding [[saltedPlaneCol]] planes 0..n-1 as `name(p, pv)`. */
  def saltedPlanesSqlCte(name: String, salt: String, n: Int): String =
    s"""$name AS (
       |  SELECT p, list(w ORDER BY d) AS pv FROM (
       |    SELECT p, d,
       |      CAST(CAST(('0x' || substr(md5('$salt:' || CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,15)) AS BIGINT) AS DOUBLE)
       |        / ${H60Range.toLong}.0 * 2 - 1 AS w
       |    FROM (SELECT unnest(generate_series(0, ${n - 1})) AS p)
       |    CROSS JOIN (SELECT unnest(generate_series(0, ${Dim - 1})) AS d))
       |  GROUP BY p)""".stripMargin

  /** Planes 0..n-1 as a LOCAL (p, pv) frame — the planes as broadcast DATA
    * instead of literal expression trees (r17). The fused projection form
    * (L×b dots over literal arrays = up to 15,360 literal doubles in one
    * Project) cost ~2.6 s of DRIVER time per execution at the dedup
    * operating point — Catalyst analysis/optimization walks the whole tree
    * every run (measured on dd_embedding_lsh: executor jobs 1.3 s, wall
    * 3.9 s; the gap was plan processing) — on top of the generated method
    * exceeding JIT limits executor-side (the GraphAnn entry-seed lesson).
    */
  private def planesDf(s: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    import s.implicits._
    (0 until n).map(p => (p, planes(p))).toDF("p", "pv")
  }

  /** One row per (input row × table): columns of `df` + `lsh_table`,
    * `lsh_bucket`. REQUIRES a unique `vec_id` column in `df` (both
    * consumers' contract): bucket ids are computed on (vec_id, v) via a
    * broadcast plane-per-row join — one small JIT-compiled dot per
    * (row, plane) — aggregated into the b-bit bucket word per (vec_id,
    * table), then joined back by id. Identical bucket values to the fused
    * projection: same dot (element order), same `> 0` sign rule, same
    * `1 << i` bit positions, null dots contribute 0 bits in both forms.
    */
  def bucketed(df: DataFrame, v: Column, tables: Int, planesPerTable: Int): DataFrame = {
    val s = df.sparkSession
    val buckets = df.select(col("vec_id"), v.as("_lsh_v"))
      .crossJoin(broadcast(planesDf(s, tables * planesPerTable)))
      .select(col("vec_id"),
        (col("p") / planesPerTable).cast("int").as("lsh_table"),
        when(Exprs.dot(col("_lsh_v"), col("pv")) > 0,
          expr(s"shiftleft(1, p % $planesPerTable)"))
          .otherwise(lit(0)).as("bit"))
      .groupBy(col("vec_id"), col("lsh_table"))
      // bit_or, not sum (ADVICE r17): identical for the contract's unique
      // vec_id (each plane contributes a distinct bit exactly once), and
      // duplicate-id inputs degrade to a still-well-formed bucket word
      // instead of a sum-corrupted one
      .agg(expr("bit_or(bit)").cast("int").as("lsh_bucket"))
    df.join(buckets, Seq("vec_id"))
  }
}
