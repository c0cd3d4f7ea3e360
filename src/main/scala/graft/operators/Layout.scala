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

  def defs: Seq[QueryDef] = Seq(
    sqlChecked("lo_zorder", layoutSql("//")) { (s, dir) =>
      import s.implicits._
      // identical SQL in Spark's dialect over a temp view — the layout IS
      // relational algebra; nothing here needs the DataFrame DSL, and one
      // shared generator keeps the two engines' arithmetic in lockstep
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql(layoutSql("DIV").replace("ORDER BY layout, file_id", ""))
        .transform(d => QueryDef.smallSort(d, $"layout", $"file_id"))
    })
}
