package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension (the brief's tier (c): custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`): per-key top-k WITHOUT
  * sorting.
  *
  * The composable formulation — `row_number().over(partitionBy(keys)
  * .orderBy(...))` then `rn <= k` — makes Spark SORT every partition's full
  * data (O(n log n) per partition, full materialization before the window
  * walks it) just to throw away all but k rows per key. This operator keeps
  * a bounded k-row heap per key instead: one streaming pass, O(n log k)
  * comparisons, memory O(keys × k) rows — at 100 TB the difference between
  * spilling a full sort of every partition and never holding more than the
  * answer. `requiredChildDistribution = ClusteredDistribution(keys)` tells
  * the planner to insert exactly the one hash Exchange the semantics need;
  * there is NO Sort node anywhere in the plan (TopKSpec asserts both).
  *
  * Output rows surface in ascending rank order per key, rank itself is not
  * materialized (append it downstream if needed).
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** OPERATING ENVELOPE: task memory is O(distinct keys in the task × k) rows
  * with NO spill path — the heaps are the operator's whole point (never hold
  * more than the answer), so the answer itself must fit in a task. That
  * holds when keys are group-like (dates, cities, categories: answer ≪
  * input); it breaks when keys approach row cardinality (then the "answer"
  * IS the input and a sort-based window plan with spill support is the
  * right tool — [[TopKPerKey.windowed]] / [[TopKPerKey.perKeyAuto]]).
  * Rather than let that misuse manifest as an executor OOM mid-shuffle, the
  * exec counts held rows and fails fast with an actionable message past
  * [[TopKPerKeyExec.MaxHeldRowsPerTask]].
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // The one shuffle the semantics need: co-locate each key's rows.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val kk = k
    val maxHeld = TopKPerKeyExec.MaxHeldRowsPerTask
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // codegen'd row comparator, generated once per task on the executor
      val ord: Ordering[InternalRow] = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap under `ord`: head = currently-worst of the kept k
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      var held = 0L
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElse(key, {
          val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), h)
          h
        })
        if (heap.size < kk) {
          heap += row.copy()
          held += 1
          if (held > maxHeld)
            throw new org.apache.spark.SparkException(
              s"TopKPerKeyExec held > $maxHeld rows (keys×k) in one task — key " +
                "cardinality is too high for the bounded-heap operator; use " +
                "TopKPerKey.windowed (sort-based, spillable) or perKeyAuto.")
        } else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += row.copy()
        }
      }
      // dequeueAll yields worst-first; reverse to ascending rank order
      heaps.valuesIterator.flatMap(h => h.dequeueAll.reverse.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Fail-fast ceiling on rows held per task (≈ a few hundred MB of typical
    * rows — far below executor memory, far above any sane per-key answer).
    */
  val MaxHeldRowsPerTask: Long = 8L << 20
}

object TopKPerKey {

  /** Top-k rows per key group, ordered by `order` ((column, ascending)
    * pairs — make it a TOTAL order or "top" is not well-defined). Installs
    * [[TopKPerKeyStrategy]] on the session idempotently.
    */
  def perKey(
      df: DataFrame,
      keyNames: Seq[String],
      order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val session = df.sparkSession
    if (!session.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      session.experimental.extraStrategies =
        session.experimental.extraStrategies :+ TopKPerKeyStrategy
    val analyzed = org.apache.spark.sql.graftbridge.Bridge.analyzed(df)
    def attr(n: String): Attribute = analyzed.output
      .find(_.name.equalsIgnoreCase(n))
      .getOrElse(throw new IllegalArgumentException(
        s"no column $n in ${analyzed.output.map(_.name)}"))
    val node = TopKPerKeyNode(
      keyNames.map(attr),
      order.map { case (n, asc) => SortOrder(attr(n), if (asc) Ascending else Descending) },
      k, analyzed)
    org.apache.spark.sql.graftbridge.Bridge.ofRows(df, node)
  }

  /** The composable sort-based formulation of the same semantics
    * (row_number window then filter, rank not materialized) — O(n log n)
    * per partition but SPILLABLE, so it has no key-cardinality envelope.
    * The fallback target when [[perKey]]'s bounded heaps don't fit.
    */
  def windowed(
      df: DataFrame,
      keyNames: Seq[String],
      order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val cols = order.map { case (n, asc) => if (asc) col(n).asc else col(n).desc }
    val w = Window.partitionBy(keyNames.map(col): _*).orderBy(cols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Chooses the plan by the envelope: estimates distinct keys with one
    * cheap HLL pass over the key columns; if the estimated held rows per
    * task exceed `maxHeldRowsPerTask`, the answer doesn't fit bounded heaps
    * and the spillable window plan is used; otherwise the heap operator.
    * The estimate pass scans only the key columns (column-pruned at the
    * source).
    *
    * NOTE this is an EAGER estimation job at DataFrame-construction time
    * (one `approx_count_distinct` scan + collect of a single long), not a
    * lazy plan — callers building plans they may never execute should call
    * [[perKey]]/[[windowed]] directly.
    *
    * Skew margin (ADVICE r06): the keys/tasks quotient assumes uniform
    * key→task distribution; hash partitioning concentrates heavy-hitter
    * KEYS fine (each key's heap is still k rows) but task-level key counts
    * vary ~Poisson and HLL itself is ±2%. The chooser therefore compares
    * against `maxHeldRowsPerTask / SkewSafetyFactor` (4×) — heap wins only
    * with a 4× cushion, so a task holding several times the mean key count
    * still sits inside the fail-fast guard rather than tripping it mid-job.
    */
  val SkewSafetyFactor = 4L

  def perKeyAuto(
      df: DataFrame,
      keyNames: Seq[String],
      order: Seq[(String, Boolean)],
      k: Int,
      maxHeldRowsPerTask: Long = TopKPerKeyExec.MaxHeldRowsPerTask): DataFrame = {
    import org.apache.spark.sql.functions.approx_count_distinct
    val estKeys = df
      .agg(approx_count_distinct(
        org.apache.spark.sql.functions.struct(
          keyNames.map(org.apache.spark.sql.functions.col): _*)).as("n"))
      .collect().head.getLong(0)
    val tasks = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    if (estKeys.toDouble * k / tasks > maxHeldRowsPerTask.toDouble / SkewSafetyFactor)
      windowed(df, keyNames, order, k)
    else perKey(df, keyNames, order, k)
  }
}
