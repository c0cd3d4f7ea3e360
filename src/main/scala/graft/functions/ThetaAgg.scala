package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Theta-sketch distinct-set builder as a custom Catalyst aggregate
  * (`TypedImperativeAggregate` over Apache DataSketches theta, already on
  * Spark's classpath as a Spark dependency): folds long keys into a
  * bounded-size sample of the key set's hash space.
  *
  * Why theta and not HLL (q40): theta sketches close under the FULL set
  * algebra — union, INTERSECTION and DIFFERENCE ([[ThetaAgg.intersect]] /
  * [[ThetaAgg.aNotB]]) — because the sketch retains actual hash samples
  * below its θ threshold rather than register maxima. HLL unions perfectly
  * but cannot intersect; audience-overlap questions ("distinct users in A
  * AND B / A but not B") at 100 TB are exactly intersections of distinct
  * sets built on different days/shards/tables. State is bounded (k=4096
  * retained hashes ≈ 32 KiB; EXACT below k, ~1.6% RSE above), `merge` is a
  * set union — associative and commutative; below k the retained set (and
  * its ordered serialization) is partitioning-independent, while above k
  * θ depends on insertion history and only the error bound holds — and
  * the per-set sketches are the persisted artifact: any overlap question
  * is answered by set algebra over KILOBYTE sketches, never by re-joining
  * the raw tables (the q40_hll_cube sketch-table discipline, extended from
  * rollups to set ops).
  *
  * Estimates are engine-specific, so query rows carry exact companions +
  * tolerance booleans (the q20 discipline); ThetaSpec pins estimation-mode
  * error, set-algebra exactness below k, and repartition invariance.
  */
case class ThetaAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_agg requires a bigint input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult)
    b1
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "theta_agg"
}

object ThetaAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** `theta_agg(keyCol)` as a usable aggregation Column (binary result). */
  def apply(key: Column): Column =
    Bridge.column(new ThetaAgg(Bridge.expression(key)).toAggregateExpression())

  /** Driver-side set algebra over serialized sketches (the sketches are
    * kilobytes — model-collect scale, never data scale).
    */
  def wrap(bytes: Array[Byte]): Sketch = Sketches.wrapSketch(Memory.wrap(bytes))

  /** Serialized empty sketch — the identity for union/intersect/aNotB, used
    * as the fallback when an audience has no qualifying members.
    */
  def emptySketchBytes: Array[Byte] =
    SetOperation.builder().buildUnion().getResult.toByteArray

  def union(a: Sketch, b: Sketch): CompactSketch = {
    val u = SetOperation.builder().buildUnion()
    u.union(a); u.union(b); u.getResult
  }

  def intersect(a: Sketch, b: Sketch): CompactSketch = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(a); i.intersect(b); i.getResult
  }

  def aNotB(a: Sketch, b: Sketch): CompactSketch =
    SetOperation.builder().buildANotB().aNotB(a, b)
}
