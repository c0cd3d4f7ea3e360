package graft

import org.scalatest.matchers.should.Matchers

/** Physical-plan shape assertions — the 100 TB properties the queries are
  * designed around, pinned so a refactor can't silently regress them:
  * filters and projections must reach the parquet scan, small dims must
  * broadcast, top-k must plan TakeOrderedAndProject, and the all-pairs
  * cosine must keep its codegen'd dot product.
  */
class PlanSpec extends SparkSuite with Matchers {

  private val dir = sf("sf0.001")

  // Plan text is taken with largeSort degraded to a plain orderBy — the
  // default checkpoint would collapse everything below the presentation
  // sort into an RDD scan and every inner-shape assertion would go vacuous.
  private def plan(name: String): String = withPlainSort {
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
  }

  test("q02: predicate and projection are pushed into the parquet scan") {
    val p = plan("q02_filter_project")
    p should include("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]")
    // pruned read schema: only the 4 referenced columns, not the full table
    p should include("o_orderkey")
    (p should not).include("o_orderpriority")
  }

  test("q03: dimension side is broadcast (fact side never shuffles)") {
    plan("q03_join_filter") should include("BroadcastHashJoin")
  }

  test("q06: top-k plans TakeOrderedAndProject, not a global sort") {
    plan("q06_topk") should include("TakeOrderedAndProject")
  }

  test("q04: aggregation happens below the join (aggregate-before-join)") {
    val p = plan("q04_leftjoin_nullfill")
    val joinPos = p.indexOf("Join")
    val aggPos = p.lastIndexOf("HashAggregate")
    joinPos should be >= 0
    aggPos should be > joinPos // child plans print below their parent
  }

  test("dd_embedding_cosine: codegen'd graft_dot, no interpreted HOF lambda") {
    val p = plan("dd_embedding_cosine")
    p should include("graft_dot")
    (p should not).include("aggregate(zip_with")
  }

  test("q28/q29: semi and anti joins plan as LeftSemi/LeftAnti (no fan-out + dedup)") {
    plan("q28_semijoin") should include("LeftSemi")
    plan("q29_antijoin") should include("LeftAnti")
  }

  test("q30: all five window functions share ONE hash-partitioning exchange") {
    val p = plan("q30_window_analytics")
    "Exchange hashpartitioning".r.findAllMatchIn(p).size shouldBe 1
  }

  test("q41: both interval-RANGE frames share ONE window sort + exchange") {
    val p = plan("q41_range_interval_window")
    "Exchange hashpartitioning".r.findAllMatchIn(p).size shouldBe 1
    "Window ".r.findAllMatchIn(p).size shouldBe 1 // one Window node for the pair
  }

  test("q42: the correlated LATERAL LIMIT decorrelates to a rank window, no nested loop") {
    val p = plan("q42_lateral")
    // Catalyst rewrites the per-nation ORDER BY ... LIMIT 2 into a window
    // over ONE customer-side partitioning joined back to nation — a
    // per-row lateral re-scan would print BroadcastNestedLoopJoin
    p should include("Window")
    (p should not).include("NestedLoop")
  }

  test("q31: grouping sets plan one Expand over one scan, not one scan per set") {
    val p = plan("q31_grouping_sets")
    p should include("Expand")
    "Scan parquet".r.findAllMatchIn(p).size shouldBe 1
  }

  test("q22: every dimension of the snowflake broadcasts; the fact never exchanges") {
    val p = plan("q22_regional_revenue")
    p should include("BroadcastHashJoin")
    // the only hash exchange is the final aggregation's, never a join's
    "Exchange hashpartitioning".r.findAllMatchIn(p).size should be <= 1
  }

  test("fk pipeline: customer dim broadcast; single window shuffle for dedup") {
    val p = withPlainSort {
      SparkEntry.queries("fk_daily_city_sales")(spark, dir)
        .queryExecution.executedPlan.toString
    }
    p should include("BroadcastHashJoin")
    p should include("row_number()")
  }

  test("largeSort: presentation sort reads a materialized child, not a re-executed plan") {
    // The bounds-sampling re-execution fix (VERDICT r08 #3): by default the
    // top Sort's child must be the localCheckpoint scan (an RDD scan node),
    // so RangePartitioner's sampling and the sort shuffle share ONE
    // materialization of the child plan instead of running it twice.
    val df = SparkEntry.queries("q15_refund_rollup")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    p should include("Sort")
    p should include("Scan ExistingRDD")
    (p should not).include("Scan parquet") // the scans ran once, inside the checkpoint
    // and the conf escape restores the full plan for shape inspection
    val full = withPlainSort {
      SparkEntry.queries("q15_refund_rollup")(spark, dir).queryExecution.executedPlan.toString
    }
    full should include("Scan parquet")
    (full should not).include("Scan ExistingRDD")
  }

  test("ta_tokens: tokenization runs on norm_words, no regex machine in the plan") {
    val p = plan("ta_tokens")
    p should include("norm_words")
    (p should not).include("regexp_replace")
  }

  test("ta_langid: trigram stage is packed_trigrams; profile joins on the int key") {
    val p = plan("ta_langid")
    p should include("packed_trigrams")
    (p should not).include("substring(norm") // the old per-position substring chain
    p should include("BroadcastHashJoin") // profile side broadcasts
  }

  test("q01: money sums run on the int128 aggregate, no decimal sum buffer") {
    val p = plan("q01_pricing_summary")
    p should include("exact_unscaled_sum")
    (p should not).include("sum(cast(l_quantity")
  }

  test("q39: recursion is pre-materialized; valve restored; root covers all parts") {
    // The data-sized cteRecursionRowLimit valve must NOT leak into the
    // shared session: the walk executes eagerly under the sized valve
    // (so the returned plan reads the checkpointed RDD, not a live
    // UnionLoop) and the prior conf value is restored before the query
    // builder returns.
    val valveKey = "spark.sql.cteRecursionRowLimit"
    val before = spark.conf.getOption(valveKey)
    val df = withPlainSort { SparkEntry.queries("q39_bom_rollup")(spark, dir) }
    spark.conf.getOption(valveKey) shouldBe before
    df.queryExecution.executedPlan.toString should include("ExistingRDD")
    val rows = df.collect()
    val nParts = Tables.part(spark, dir).count()
    val maxKey = rows.map(_.getLong(0)).max
    // the virtual root (part 0) is an ancestor of every part...
    val root = rows.find(_.getLong(0) == 0L).get
    root.getLong(1) shouldBe nParts
    // ...at the full chain depth: digits(maxKey) levels above the deepest leaf
    root.getLong(2) shouldBe maxKey.toString.length.toLong
    // a leaf-range ancestor (no other part has it as a proper ancestor
    // except its own DIV-10 descendants): subtree must include itself
    rows.foreach(r => r.getLong(1) should be >= 1L)
  }

  test("ta_html_extract: per-row scan — block features in array lambdas, no explode, no exchange below the sort") {
    val p = plan("ta_html_extract")
    // the whole extraction is per-row: no explode-and-reaggregate
    (p should not).include("Generate")
    "Exchange hashpartitioning".r.findAllMatchIn(p).size shouldBe 0
    "Exchange rangepartitioning".r.findAllMatchIn(p).size shouldBe 1
  }

  test("ta_url_canon: per-row scan — text never read, no exchange below the sort") {
    val p = plan("ta_url_canon")
    // the URL derives from (doc_id, source); the text column must be pruned
    (p should not).include("text")
    // pure per-row exprs: the only exchange is the presentation range sort
    "Exchange hashpartitioning".r.findAllMatchIn(p).size shouldBe 0
    "Exchange rangepartitioning".r.findAllMatchIn(p).size shouldBe 1
  }

  test("dd_url_dedup: exactly the two designed shuffles (canon_url, then host)") {
    val p = plan("dd_url_dedup")
    (p should not).include("\"text\"")
    "Exchange hashpartitioning".r.findAllMatchIn(p).size shouldBe 2
  }
}
