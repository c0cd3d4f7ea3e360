package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.QueryDef.sqlChecked

/** Data-LAYOUT operator: Z-order (Morton) clustering + zone maps — the
  * mechanism behind multidimensional file skipping (Delta OPTIMIZE ZORDER,
  * Iceberg sort orders, Hudi clustering; Morton 1966). Rows are assigned to
  * 16 "files" two ways:
  *
  *  - `zorder`: each dim normalized to 8 bits, bit-interleaved into a
  *    16-bit Morton code, file = top 4 bits → a 4×4 tile grid over the
  *    (partkey, suppkey) plane, so every file's zone map (min/max per dim)
  *    is a TIGHT rectangle;
  *  - `linear`: files cut by orderkey range (insertion order) — every file
  *    spans nearly the full range of BOTH probe dims.
  *
  * A fixed band probe (middle eighth of each dim) then reads the zone maps:
  * under zorder it intersects only the tiles the band crosses; under linear
  * it hits every file. That differential — scanned-file count as a function
  * of layout, decided entirely by per-file min/max stats — is the entire
  * economics of clustering at 100 TB, here made oracle-checkable.
  *
  * Everything is integer arithmetic on 1-row min/max aggregates (broadcast
  * back — no second scan semantics: normalization bounds, file cuts and
  * probe bounds all derive from the same aggregate), so layout, zone maps
  * and hit flags are bit-identical in both engines. The real writer's
  * analogue of the file cut is `repartitionByRange(zCol)` + per-file
  * parquet min/max stats; equal-WIDTH cuts here keep it sampling-free and
  * deterministic (equal-size cuts need a global rank).
  */
object Layout {

  /** Bits per dimension in the Morton code (8 → 256 normalized levels). */
  val ZBits = 8

  /** File count = 2^4 → top 4 Morton bits → a 4×4 tile grid. */
  val ZFiles = 16

  /** Engine-portable bit interleave: Σ_i ((x DIV 2^i) % 2) · 4^i · (1|2) —
    * pure integer arithmetic, no shift operators (DuckDB `//` = Spark
    * `DIV` on non-negatives).
    */
  private def morton(npCol: String, nsCol: String, div: String): String =
    (0 until ZBits).map { i =>
      val p2 = 1L << i; val even = 1L << (2 * i); val odd = 1L << (2 * i + 1)
      s"(($npCol $div $p2) % 2) * $even + (($nsCol $div $p2) % 2) * $odd"
    }.mkString("(", " + ", ")")

  /** The full layout computation for one engine dialect. `div` is the
    * integer-division operator; everything else is common SQL.
    */
  private def layoutSql(div: String): String = {
    val zMax = 1L << (2 * ZBits)
    s"""WITH mm AS (
       |  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
       |         min(l_suppkey) AS smin, max(l_suppkey) AS smax,
       |         min(l_orderkey) AS okmin, max(l_orderkey) AS okmax
       |  FROM lineitem),
       |norm AS (
       |  SELECT l_partkey AS p, l_suppkey AS s,
       |    (l_partkey - pmin) * ${(1 << ZBits) - 1} $div (CASE WHEN pmax > pmin THEN pmax - pmin ELSE 1 END) AS np,
       |    (l_suppkey - smin) * ${(1 << ZBits) - 1} $div (CASE WHEN smax > smin THEN smax - smin ELSE 1 END) AS ns,
       |    (l_orderkey - okmin) * ${ZFiles - 1} $div (CASE WHEN okmax > okmin THEN okmax - okmin ELSE 1 END) AS lin_file
       |  FROM lineitem CROSS JOIN mm),
       |coded AS (
       |  SELECT p, s, lin_file,
       |    ${morton("np", "ns", div)} $div ${zMax / ZFiles} AS z_file
       |  FROM norm),
       |files AS (
       |  SELECT 'zorder' AS layout, z_file AS file_id, count(*) AS n_rows,
       |    min(p) AS p_min, max(p) AS p_max, min(s) AS s_min, max(s) AS s_max
       |  FROM coded GROUP BY z_file
       |  UNION ALL
       |  SELECT 'linear' AS layout, lin_file AS file_id, count(*) AS n_rows,
       |    min(p) AS p_min, max(p) AS p_max, min(s) AS s_min, max(s) AS s_max
       |  FROM coded GROUP BY lin_file),
       |probe AS (
       |  SELECT pmin + (pmax - pmin) * 3 $div 8 AS p1, pmin + (pmax - pmin) * 4 $div 8 AS p2,
       |         smin + (smax - smin) * 3 $div 8 AS s1, smin + (smax - smin) * 4 $div 8 AS s2
       |  FROM mm)
       |SELECT layout, CAST(file_id AS BIGINT) AS file_id, n_rows,
       |  p_min, p_max, s_min, s_max,
       |  (p_min <= p2 AND p_max >= p1 AND s_min <= s2 AND s_max >= s1) AS probe_hit
       |FROM files CROSS JOIN probe
       |ORDER BY layout, file_id""".stripMargin
  }

  /** Grid side for the Hilbert walk (2^ZBits). */
  private val HSide = 1 << ZBits

  /** Unrolled Hilbert xy→d (Hilbert 1891; the iterative bit-level form of
    * Butz 1971 / the widely published xy2d loop): ZBits levels, each
    * consuming one bit of (x, y), accumulating s²·((3·rx) XOR ry) and
    * rotating/reflecting the low bits for the next level. Reflection uses
    * the full-grid complement (HSide−1−v): levels below s only ever read
    * bits < s, and the complement flips exactly those, so it is equivalent
    * to the quadrant-local reflection while keeping every step a plain
    * CASE over integer division — no bitwise ops, both dialects identical.
    * Emitted as a chain of SELECTs (`h7`…`h0`), the per-row loop state
    * made relational — the ta_bpe_train unrolling discipline.
    */
  private def hilbertCtes(div: String): String = {
    val levels = (ZBits - 1) to 0 by -1
    val steps = levels.map { lvl =>
      val s = 1L << lvl
      val prev = if (lvl == ZBits - 1) "hstart" else s"h${lvl + 1}"
      s"""h$lvl AS (
         |  SELECT p, s, z_file,
         |    CASE WHEN (hy $div $s) % 2 = 1 THEN hx
         |         WHEN (hx $div $s) % 2 = 1 THEN ${HSide - 1} - hy
         |         ELSE hy END AS hx,
         |    CASE WHEN (hy $div $s) % 2 = 1 THEN hy
         |         WHEN (hx $div $s) % 2 = 1 THEN ${HSide - 1} - hx
         |         ELSE hx END AS hy,
         |    hd + ${s * s} * (CASE WHEN (hx $div $s) % 2 = 0 AND (hy $div $s) % 2 = 0 THEN 0
         |                          WHEN (hx $div $s) % 2 = 0 AND (hy $div $s) % 2 = 1 THEN 1
         |                          WHEN (hx $div $s) % 2 = 1 AND (hy $div $s) % 2 = 1 THEN 2
         |                          ELSE 3 END) AS hd
         |  FROM $prev)""".stripMargin
    }
    (s"""hstart AS (
        |  SELECT p, s, z_file, np AS hx, ns AS hy, 0 AS hd
        |  FROM coded)""".stripMargin +: steps).mkString(",\n")
  }

  /** lo_hilbert: the same probe economics as lo_zorder, but comparing the
    * TWO space-filling curves head-to-head — Hilbert-curve file cuts vs
    * Morton (Z-order) cuts over the identical normalized plane. The Hilbert
    * walk never takes the Z-curve's long diagonal jumps, so equal-width
    * cuts of the d axis are contiguous tile runs with zone-map rectangles
    * at least as tight as Morton's — which is exactly why Delta's
    * successor to OPTIMIZE ZORDER (liquid clustering) and Iceberg sort
    * orders prefer Hilbert. The probe-hit differential between the two
    * layouts is the measured form of that claim (LayoutSpec pins
    * hilbert hits ≤ zorder hits on the fixed band probe, plus the ≥75%
    * prune both curves achieve over linear).
    */
  private def hilbertSql(div: String): String = {
    val zMax = 1L << (2 * ZBits)
    s"""WITH mm AS (
       |  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
       |         min(l_suppkey) AS smin, max(l_suppkey) AS smax
       |  FROM lineitem),
       |norm AS (
       |  SELECT l_partkey AS p, l_suppkey AS s,
       |    (l_partkey - pmin) * ${(1 << ZBits) - 1} $div (CASE WHEN pmax > pmin THEN pmax - pmin ELSE 1 END) AS np,
       |    (l_suppkey - smin) * ${(1 << ZBits) - 1} $div (CASE WHEN smax > smin THEN smax - smin ELSE 1 END) AS ns
       |  FROM lineitem CROSS JOIN mm),
       |coded AS (
       |  SELECT p, s,
       |    ${morton("np", "ns", div)} $div ${zMax / ZFiles} AS z_file,
       |    np, ns
       |  FROM norm),
       |${hilbertCtes(div)},
       |files AS (
       |  SELECT 'hilbert' AS layout, hd $div ${zMax / ZFiles} AS file_id, count(*) AS n_rows,
       |    min(p) AS p_min, max(p) AS p_max, min(s) AS s_min, max(s) AS s_max
       |  FROM h0 GROUP BY hd $div ${zMax / ZFiles}
       |  UNION ALL
       |  SELECT 'zorder' AS layout, z_file AS file_id, count(*) AS n_rows,
       |    min(p) AS p_min, max(p) AS p_max, min(s) AS s_min, max(s) AS s_max
       |  FROM h0 GROUP BY z_file),
       |probe AS (
       |  SELECT pmin + (pmax - pmin) * 3 $div 8 AS p1, pmin + (pmax - pmin) * 4 $div 8 AS p2,
       |         smin + (smax - smin) * 3 $div 8 AS s1, smin + (smax - smin) * 4 $div 8 AS s2
       |  FROM mm)
       |SELECT layout, CAST(file_id AS BIGINT) AS file_id, n_rows,
       |  p_min, p_max, s_min, s_max,
       |  (p_min <= p2 AND p_max >= p1 AND s_min <= s2 AND s_max >= s1) AS probe_hit
       |FROM files CROSS JOIN probe
       |ORDER BY layout, file_id""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    sqlChecked("lo_zorder", layoutSql("//")) { (s, dir) =>
      import s.implicits._
      // identical SQL in Spark's dialect over a temp view — the layout IS
      // relational algebra; nothing here needs the DataFrame DSL, and one
      // shared generator keeps the two engines' arithmetic in lockstep
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql(layoutSql("DIV").replace("ORDER BY layout, file_id", ""))
        .transform(d => QueryDef.smallSort(d, $"layout", $"file_id"))
    },

    sqlChecked("lo_hilbert", hilbertSql("//")) { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql(hilbertSql("DIV").replace("ORDER BY layout, file_id", ""))
        .transform(d => QueryDef.smallSort(d, $"layout", $"file_id"))
    })
}
