package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL quantile sketch builder as a custom Catalyst aggregate
  * (`TypedImperativeAggregate` over Apache DataSketches KLL, on Spark's
  * classpath): folds doubles into a bounded-size summary that answers any
  * quantile/rank query with a PUBLISHED normalized rank-error guarantee
  * (Karnin–Lang–Liberty, FOCS'16: |true_rank(q̂_p) − p| ≤ ε w.h.p.;
  * ε ≈ 1.65% single-quantile at the default k=200, ~1 KiB of state).
  *
  * Why a sketch and not `percentile`/sort: an exact grouped percentile
  * needs every group's values collected and ordered — at 100 TB that is a
  * full-data sort per group. The KLL buffer is fixed-size, `merge` is
  * associative/commutative (map-side combine collapses each partition to
  * one ~1 KiB sketch before the shuffle), and per-group sketches are a
  * persistable artifact: any later quantile question is answered from
  * kilobytes (the q40 sketch-table discipline, extended from cardinality
  * to distributions). Spark's own `approx_percentile` (q32) answers one
  * query in-plan; the KLL aggregate is the mergeable, storable form.
  *
  * Estimates are engine- and run-specific (KLL compaction draws random
  * offsets), so query rows carry exact companions + rank-error tolerance
  * booleans (the q20 discipline) instead of raw estimates; KllSpec pins
  * measured rank error and merge-equivalence across partitionings.
  */
case class KllAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_agg requires a double input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "kll_agg"
}

object KllAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** `kll_agg(valueCol)` as a usable aggregation Column (binary result). */
  def apply(value: Column): Column = apply(value, 200)
  def apply(value: Column, k: Int): Column =
    Bridge.column(new KllAgg(Bridge.expression(value), k).toAggregateExpression())

  /** Driver-side view over a serialized sketch (KB-scale — model-collect).
    *
    * Empty-sketch caveat: a group whose input column is entirely null
    * produces a VALID serialized sketch with `getN == 0`, and DataSketches'
    * `getQuantile`/`getRank` throw `SketchesArgumentException` on it (the
    * quantile of an empty set is undefined — there is no sentinel to
    * return). The SQL-exposed `kll_agg` makes this reachable by users:
    * guard with `sketch.isEmpty` before querying quantiles, exactly as the
    * in-repo call sites do implicitly by aggregating non-null columns.
    */
  def wrap(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}
