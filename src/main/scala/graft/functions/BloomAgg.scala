package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom-filter bit-set builder as a custom Catalyst aggregate
  * (`TypedImperativeAggregate`): folds 64-bit key hashes into one
  * fixed-size bit array (`numBits` bits as `numBits/64` longs), setting
  * `probes` bits per key at the Kirsch–Mitzenmacher double-hashed
  * positions
  *
  * {{{ p_i = (h1 + i·h2) mod m,  h1 = h mod m,  h2 = 2·((h div m) mod m) + 1 }}}
  *
  * (h2 forced odd so the probe stride never degenerates; all arithmetic
  * stays in small positive longs, so the IDENTICAL integer formula is
  * replayable as DuckDB BIGINT SQL — which is how the oracle of
  * `ta_decontam_bloom` re-derives every set bit).
  *
  * Why an aggregate: membership state for a key set becomes a FIXED-SIZE
  * value (here 2^20 bits = 128 KiB) regardless of key count, built in one
  * pass with `merge` = bitwise OR — associative and commutative, so the
  * partial/merge contract is exactly a built-in aggregate's and the result
  * is partitioning-independent (BloomSpec pins repartition-invariance).
  * At 100 TB scale this is the point: an exact distinct-key set for a
  * membership broadcast grows with the data (8 bytes × n), while the bloom
  * is sized once from the expected key count and target false-positive
  * rate (m ≈ 1.44 · k · n bits) and MERGES by OR across any number of
  * partitions/shards/days — the standard cross-corpus membership
  * structure for decontamination and incremental dedup.
  *
  * False positives are a measured property, not a correctness leak: every
  * bloom hit is exactly verified downstream (the candidates-only join in
  * `ta_decontam_bloom`); false negatives are impossible by construction.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    probes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")
  require(probes >= 1 && probes <= 8, s"probes must be in [1, 8], got $probes")

  private val words = numBits / 64

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a bigint input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val m = numBits.toLong
      val h1 = h % m
      val h2 = 2L * ((h / m) % m) + 1L
      var i = 0
      while (i < probes) {
        val p = (h1 + i * h2) % m
        buf((p >>> 6).toInt) |= 1L << (p & 63L)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < words) { b1(j) |= b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "bloom_agg"
}

object BloomAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.expr
  import org.apache.spark.sql.graftbridge.Bridge

  /** `bloom_agg(keyHash)` as a usable aggregation Column. */
  def apply(keyHash: Column, numBits: Int, probes: Int): Column =
    Bridge.column(
      new BloomAgg(Bridge.expression(keyHash), numBits, probes).toAggregateExpression())

  /** Membership-test predicate: all `probes` bits of `hashCol` set in
    * `bitsCol` (an `array<bigint>` produced by [[apply]]). Pure integer
    * column arithmetic — `DIV`/`%` keep the 60-bit hash exact (a double
    * division would not) — mirroring the probe formula bit for bit.
    */
  def mightContain(bitsCol: String, hashCol: String, numBits: Int, probes: Int): Column = {
    val m = numBits
    val probeTests = (0 until probes).map { i =>
      val p = s"((($hashCol % $m) + $i * (2 * (($hashCol DIV $m) % $m) + 1)) % $m)"
      s"(element_at($bitsCol, CAST($p DIV 64 AS INT) + 1) & shiftleft(CAST(1 AS BIGINT), CAST($p % 64 AS INT))) <> 0"
    }
    expr(probeTests.mkString(" AND "))
  }

  /** DuckDB twin of the probe-position formula: one row per (key, probe)
    * position, for replaying the bloom's set-bit union in SQL.
    */
  def positionsSql(hashExpr: String, probeVar: String, numBits: Int): String =
    s"((($hashExpr % $numBits) + $probeVar * (2 * (($hashExpr // $numBits) % $numBits) + 1)) % $numBits)"
}
