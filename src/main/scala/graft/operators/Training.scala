package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.QueryDef.sqlChecked

/** Distributed LOGISTIC-REGRESSION training in exact integer arithmetic —
  * the iterative-gradient face of the quality-classifier story
  * (ta_classifier_score trains the closed-form Naive-Bayes distillation;
  * real curation pipelines train a linear classifier by gradient descent,
  * fastText-style — Joulin et al. 2016). Shape per step: broadcast the
  * O(features) weight vector, ONE scan computes per-row integer gradients,
  * map-side partial sums collapse every partition to a single 4-long row
  * before the 1-row collect — the canonical data-parallel GD topology
  * (the sim_kmeans_train discipline with a gradient instead of centroid
  * means). At 100 TB: per-step cost = one linear scan of the cached
  * feature table; driver traffic = 32 bytes/step.
  *
  * Engine-exactness: the logistic σ is replaced by the published
  * HARD-SIGMOID σ_h(z) = clamp(0.5 + z/4, 0, 1) (Courbariaux et al. 2015,
  * BinaryConnect; MobileNetV3's h-sigmoid) evaluated in integer
  * micro-units — weights, activations and gradients are all BIGINTs, so
  * every step is bit-identical in any engine, under any partitioning and
  * any summation order (no libm call anywhere). The oracle unrolls the
  * full 3-step trajectory as a CTE chain (the pagerank/kmeans discipline):
  * every intermediate weight vector is pinned, not just the final one.
  *
  * Features (all small integers; label = the Gopher-rule conjunction the
  * NB distillation also targets): bias, capped n_tokens/10, capped
  * stopword count, integer distinct-token decile.
  */
object Training {

  /** Micro-unit scale for weights/activations (1.0 ≡ 1e6). */
  val Scale = 1000000L

  val Steps = 3

  /** Learning-rate denominator: Δw_j = Σ_i g_ij DIV (n · LrDen) — i.e.
    * 1/LrDen of the mean gradient, in micro-units.
    */
  val LrDen = 100L

  /** σ_h(z)·1e6 for a micro-unit z, as a SQL fragment (Spark and DuckDB
    * agree on DIV/`//` truncation toward zero, greatest/least semantics).
    */
  private def hardSigmoid(zMicro: String, div: String): String =
    s"greatest(least(500000 + ($zMicro) $div 4, 1000000), 0)"

  /** One GD trajectory over a (x0..x3, y) integer feature frame: returns
    * (step, weights) for steps 0..Steps. Exposed for LogregSpec (planted
    * separable data, partitioning invariance).
    */
  def trainTrajectory(feat: DataFrame): Seq[(Long, Array[Long])] = {
    val n = feat.count()
    val w = Array(0L, 0L, 0L, 0L)
    val traj = scala.collection.mutable.Buffer((0L, w.clone()))
    for (k <- 1 to Steps) {
      val z = s"(${w(0)}L * x0 + ${w(1)}L * x1 + ${w(2)}L * x2 + ${w(3)}L * x3)"
      val s = hardSigmoid(z, "DIV")
      val grads = feat.selectExpr(
        (0 until 4).map(j => s"sum(x$j * (y - ($s))) AS g$j"): _*).collect().head
      // JVM Long '/' truncates toward zero — same as SQL DIV / DuckDB `//`
      for (j <- 0 until 4) w(j) += grads.getLong(j) / (n * LrDen)
      traj += ((k.toLong, w.clone()))
    }
    traj.toSeq
  }

  /** Integer feature frame from the documents table (the query's input;
    * exposed so the spec can rebuild it under different partitionings).
    */
  def features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = graft.functions.Exprs.normWords($"text")
    val nW = size(toks).cast("long")
    val meanWordLen = when(nW === 0, 0.0).otherwise(
      round(length(concat_ws("", toks)).cast("double") / nW.cast("double"), 6))
    val distinctRatio = when(nW === 0, 0.0).otherwise(
      round(size(array_distinct(toks)).cast("double") / nW.cast("double"), 6))
    val nStop = size(filter(toks, w => w.isin(TextAnalysis.stopEn: _*))).cast("long")
    val label = nW >= 20 && nW <= 100000 &&
      meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
      distinctRatio >= 0.3 && nStop >= 2
    Tables.documents(s, dir)
      .select($"doc_id", nW.as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        nStop.as("n_stop"), label.as("label"))
      .selectExpr(
        "doc_id",
        "CAST(1 AS BIGINT) AS x0",
        "least(n_tokens DIV 10, 20) AS x1",
        "least(n_stop, 20) AS x2",
        "CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) ELSE (10 * n_distinct) DIV n_tokens END AS x3",
        s"CASE WHEN label THEN CAST($Scale AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y")
  }

  /** Shared oracle CTE chain: feature frame + the full materialized
    * 3-step weight trajectory (w0..w3). Both the train and score oracles
    * read from it — the score oracle is the train chain plus one scoring
    * select over `feat CROSS JOIN w3`.
    */
  private def oracleCtes: String = {
    val labelSql =
      s"""(len(toks) >= 20 AND len(toks) <= 100000
         | AND (CASE WHEN len(toks) = 0 THEN 0.0
         |      ELSE round(length(array_to_string(toks, '')) / CAST(len(toks) AS DOUBLE), 6) END) >= 3.0
         | AND (CASE WHEN len(toks) = 0 THEN 0.0
         |      ELSE round(length(array_to_string(toks, '')) / CAST(len(toks) AS DOUBLE), 6) END) <= 10.0
         | AND (CASE WHEN len(toks) = 0 THEN 0.0
         |      ELSE round(len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE), 6) END) >= 0.3
         | AND len(list_filter(toks, w -> w IN ('the','a','and','of','to','in','is','it'))) >= 2)"""
        .stripMargin.replace("\n", " ")
    // every w/g CTE is AS MATERIALIZED and referenced via a single CROSS
    // JOIN per consumer: DuckDB inlines plain CTEs per reference, and the
    // scalar-subquery formulation re-evaluated the whole w-chain (up to
    // 4^Steps feat tokenizations — observed as a hung oracle)
    val steps = (1 to Steps).map { k =>
      val z = (0 until 4).map(j => s"w.w$j * x$j").mkString(" + ")
      val s = hardSigmoid(z, "//")
      val gs = (0 until 4).map(j => s"SUM(x$j * (y - ($s))) AS g$j").mkString(", ")
      val ws = (0 until 4).map(j =>
        s"w.w$j + g.g$j // (nn.n * $LrDen) AS w$j").mkString(", ")
      s"""g$k AS MATERIALIZED (SELECT $gs FROM feat CROSS JOIN w${k - 1} w),
         |w$k AS MATERIALIZED (SELECT $ws FROM g$k g CROSS JOIN w${k - 1} w CROSS JOIN nn)"""
    }.mkString(",\n")
    s"""WITH t AS MATERIALIZED (SELECT doc_id, ${TextAnalysis.toksSqlFrag} AS toks FROM documents),
       |feat AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(1 AS BIGINT) AS x0,
       |    least(len(toks) // 10, 20) AS x1,
       |    least(len(list_filter(toks, w -> w IN ('the','a','and','of','to','in','is','it'))), 20) AS x2,
       |    CASE WHEN len(toks) = 0 THEN CAST(0 AS BIGINT)
       |         ELSE (10 * len(list_distinct(toks))) // len(toks) END AS x3,
       |    CASE WHEN $labelSql THEN CAST($Scale AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
       |  FROM t),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM feat),
       |w0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
       |              CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3),
       |$steps""".stripMargin
  }

  private def trainOracleSql: String = {
    val out = (0 to Steps).flatMap(k => (0 until 4).map(j =>
      s"SELECT CAST($k AS BIGINT) AS step, CAST($j AS BIGINT) AS feature, CAST(w$j AS BIGINT) AS w_micro FROM w$k"))
      .mkString("\nUNION ALL ")
    s"""$oracleCtes
       |$out
       |ORDER BY step, feature""".stripMargin
  }

  private def scoreOracleSql: String = {
    val z = (0 until 4).map(j => s"w.w$j * x$j").mkString(" + ")
    s"""$oracleCtes
       |SELECT doc_id, score_micro, score_micro >= 500000 AS keep FROM (
       |  SELECT doc_id,
       |    CAST(${hardSigmoid(z, "//")} AS BIGINT) AS score_micro
       |  FROM feat CROSS JOIN w$Steps w)
       |ORDER BY doc_id""".stripMargin
  }

  private def evalOracleSql: String = {
    val z = (0 until 4).map(j => s"w.w$j * x$j").mkString(" + ")
    s"""$oracleCtes,
       |pred AS (
       |  SELECT (${hardSigmoid(z, "//")}) >= 500000 AS p, y > 0 AS t
       |  FROM feat CROSS JOIN w$Steps w),
       |cm AS (
       |  SELECT
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN p AND t THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN p AND NOT t THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN NOT p AND NOT t THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       |    CAST(sum(CASE WHEN NOT p AND t THEN 1 ELSE 0 END) AS BIGINT) AS fn
       |  FROM pred)
       |SELECT n_docs, tp, fp, tn, fn,
       |  CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp) END AS precision_micro,
       |  CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn) END AS recall_micro,
       |  CASE WHEN tp + fp > 0 AND tp + fn > 0
       |        AND tp * 1000000 // (tp + fp) + tp * 1000000 // (tp + fn) > 0
       |    THEN 2 * (tp * 1000000 // (tp + fp)) * (tp * 1000000 // (tp + fn))
       |         // (tp * 1000000 // (tp + fp) + tp * 1000000 // (tp + fn))
       |  END AS f1_micro
       |FROM cm""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    sqlChecked("ta_logreg_train", trainOracleSql) { (s, dir) =>
      import s.implicits._
      val feat = features(s, dir).cache() // Steps scans of a 5-long-column frame
      val traj = trainTrajectory(feat)
      feat.unpersist()
      traj.flatMap { case (step, ws) =>
        ws.zipWithIndex.map { case (w, j) => (step, j.toLong, w) }
      }.toDF("step", "feature", "w_micro")
        .transform(d => QueryDef.smallSort(d, $"step", $"feature"))
    },

    // INFERENCE face of the trained classifier — the stage a real pipeline
    // runs at full corpus width (CCNet §4 / fastText quality filtering:
    // train once, then score EVERY document). Train the 3-step trajectory
    // (cached feature frame, 32 B/step driver traffic), embed the final
    // micro-unit weights as literals, and score in ONE codegen scan —
    // w·x and the hard sigmoid are integer column arithmetic, so the
    // per-doc scores are bit-identical to the oracle's CTE-chain replay
    // under any partitioning. No shuffle anywhere but the presentation
    // sort: at 100 TB the scoring pass is scan-bound, the broadcastable
    // model is 32 bytes.
    sqlChecked("ta_logreg_score", scoreOracleSql) { (s, dir) =>
      import s.implicits._
      val feat = features(s, dir).cache()
      val w = trainTrajectory(feat).last._2
      feat.unpersist() // scoring below re-derives features in its own scan
      val z = s"(${w(0)}L * x0 + ${w(1)}L * x1 + ${w(2)}L * x2 + ${w(3)}L * x3)"
      val scored = features(s, dir)
        .selectExpr("doc_id", s"CAST(${hardSigmoid(z, "DIV")} AS BIGINT) AS score_micro")
        .withColumn("keep", $"score_micro" >= 500000L)
      QueryDef.largeSort(scored, $"doc_id")
    },

    // EVAL face — the confusion matrix of the trained scorer against its
    // training labels, with precision/recall/F1 as EXACT integer
    // micro-units (tp·1e6 DIV (tp+fp) etc. — no float anywhere, so the
    // metric row is bit-identical in any engine and partitioning).
    // Closes the classifier loop: train (trajectory-pinned) → score
    // (per-doc) → eval (did the 3-step model learn the Gopher label?).
    // One scan + one global conditional-count aggregate.
    sqlChecked("ta_logreg_eval", evalOracleSql) { (s, dir) =>
      import s.implicits._
      val feat = features(s, dir).cache()
      val w = trainTrajectory(feat).last._2
      feat.unpersist()
      val z = s"(${w(0)}L * x0 + ${w(1)}L * x1 + ${w(2)}L * x2 + ${w(3)}L * x3)"
      features(s, dir)
        .selectExpr(s"(${hardSigmoid(z, "DIV")}) >= 500000 AS p", "y > 0 AS t")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when($"p" && $"t", 1L).otherwise(0L)).as("tp"),
          sum(when($"p" && !$"t", 1L).otherwise(0L)).as("fp"),
          sum(when(!$"p" && !$"t", 1L).otherwise(0L)).as("tn"),
          sum(when(!$"p" && $"t", 1L).otherwise(0L)).as("fn"))
        .selectExpr("n_docs", "tp", "fp", "tn", "fn",
          "CASE WHEN tp + fp > 0 THEN tp * 1000000L DIV (tp + fp) END AS precision_micro",
          "CASE WHEN tp + fn > 0 THEN tp * 1000000L DIV (tp + fn) END AS recall_micro",
          """CASE WHEN tp + fp > 0 AND tp + fn > 0
            |      AND tp * 1000000L DIV (tp + fp) + tp * 1000000L DIV (tp + fn) > 0
            |  THEN 2 * (tp * 1000000L DIV (tp + fp)) * (tp * 1000000L DIV (tp + fn))
            |       DIV (tp * 1000000L DIV (tp + fp) + tp * 1000000L DIV (tp + fn))
            |END AS f1_micro""".stripMargin)
    })
}
