package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a custom Catalyst
  * aggregate: folds 64-bit key hashes into a `depth × width` counter grid
  * (row-major `array<bigint>`), incrementing one counter per row at the
  * Kirsch–Mitzenmacher positions
  *
  * {{{ p_i = (h1 + i·h2) mod w,  h1 = h mod w,  h2 = 2·((h div w) mod w) + 1 }}}
  *
  * (the [[BloomAgg]] probe family — small positive long arithmetic, so the
  * identical formula replays as DuckDB BIGINT SQL and the whole grid is
  * oracle-checkable). A key's frequency estimate is the MIN of its `depth`
  * counters: never an undercount, overcount bounded by e·N/width with
  * probability 1−e^−depth.
  *
  * Why an aggregate: the frequency state for heavy-hitter queries becomes
  * FIXED-SIZE (depth·width longs — here 128 KiB) regardless of key
  * cardinality, built in one pass with `merge` = element-wise add —
  * associative and commutative, so the result is partitioning-independent
  * (CountMinSpec pins repartition-invariance) and cross-shard/cross-day
  * sketches combine by addition. At 100 TB this replaces the
  * vocabulary-sized exact count table wherever only the heavy tail
  * matters; the exact top-k companion in ta_cms_heavy is the oracle's
  * ground truth, the same sketch-with-exact-companion discipline as
  * q20_sketch_stats.
  */
case class CountMinAgg(
    child: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(width > 0, s"width must be positive, got $width")
  require(depth >= 1 && depth <= 8, s"depth must be in [1, 8], got $depth")

  private val cells = depth * width

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min_agg requires a bigint input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val w = width.toLong
      val h1 = h % w
      val h2 = 2L * ((h / w) % w) + 1L
      var i = 0
      while (i < depth) {
        buf(i * width + ((h1 + i * h2) % w).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < cells) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(cells * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(cells)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "count_min_agg"
}

object CountMinAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{expr, least}
  import org.apache.spark.sql.graftbridge.Bridge

  /** `count_min_agg(keyHash)` as a usable aggregation Column. */
  def apply(keyHash: Column, width: Int, depth: Int): Column =
    Bridge.column(
      new CountMinAgg(Bridge.expression(keyHash), width, depth).toAggregateExpression())

  /** Point estimate for `hashCol` against `gridCol` (the row-major
    * `array<bigint>` produced by [[apply]]): min of the key's `depth`
    * counters. Pure integer column arithmetic mirroring the update
    * positions bit for bit.
    */
  def estimate(gridCol: String, hashCol: String, width: Int, depth: Int): Column =
    least((0 until depth).map { i =>
      val p = s"((($hashCol % $width) + $i * (2 * (($hashCol DIV $width) % $width) + 1)) % $width)"
      expr(s"element_at($gridCol, CAST($p AS INT) + 1 + ${i * width})")
    }: _*)

  /** DuckDB twin of the position formula for sketch row `probeVar`. */
  def positionSql(hashExpr: String, probeVar: String, width: Int): String =
    s"((($hashExpr % $width) + $probeVar * (2 * (($hashExpr // $width) % $width) + 1)) % $width)"
}
