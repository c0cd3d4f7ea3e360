package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash-64 as a custom Catalyst aggregate (`TypedImperativeAggregate`).
  *
  * Input: one 64-bit word hash per row (e.g. `xxhash64(word)`); output: the
  * 64-bit SimHash signature — bit j set iff the count of inputs with bit j
  * set exceeds the count with it clear (ties → 0, matching the composable
  * `sum(when(...)) > 0` formulation it replaces).
  *
  * Why an imperative aggregate instead of 64 `sum(when(...))` columns: the
  * buffer is ONE 64-int array (256 bytes) updated in a tight loop, and the
  * partial-aggregation state shuffled per group is one row of 256 bytes —
  * the column formulation shuffles 64 separate long sums and pays 64
  * expression evaluations per input row. Same map-side partial/merge/final
  * contract as any built-in aggregate, so Catalyst plans it identically.
  * Semantics equivalence with the composable form is pinned by
  * PlantedNearDupSpec ("imperative SimHashAgg equals the composable
  * formulation").
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_agg requires a bigint input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buf(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "simhash_agg"
}

object SimHashAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** `simhash_agg(wordHash)` as a usable aggregation Column. */
  def apply(wordHash: Column): Column =
    Bridge.column(new SimHashAgg(Bridge.expression(wordHash)).toAggregateExpression())
}
