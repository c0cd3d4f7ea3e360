package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Character trigrams of the langid normalization, packed into ints, as ONE
  * native expression. Replaces the chain
  * `trim(regexp_replace(lower(text), "[^a-z]+", " "))` +
  * `transform(sequence(1, len-2), i -> substring(norm, i, 3))` + explode of
  * 3-char STRINGS: one pass over the lowered bytes builds the normalized
  * [a-z ] character stream (runs of non-letters collapse to one interior
  * space, leading/trailing trimmed — exactly the regex semantics, including
  * multi-byte letters: any non-[a-z] codepoint is part of a separator run),
  * and each 3-char window is emitted as `c0*1024 + c1*32 + c2` with
  * `' '→0, 'a'→1 … 'z'→26`.
  *
  * The packing is injective on the [a-z ]³ domain, so joining the langid
  * profile on the packed INT key is semantically identical to joining on
  * the trigram string — while the join key drops from a 3-char string to 4
  * bytes and the per-position substring allocation disappears. Pinned
  * against the string formulation by PackedTrigramsSpec.
  */
case class PackedTrigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "packed_trigrams"

  override protected def nullSafeEval(input: Any): Any =
    PackedTrigrams.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PackedTrigrams.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PackedTrigrams =
    copy(child = newChild)
}

object PackedTrigrams {
  /** ' '→0, 'a'→1 … 'z'→26, packed base-32: c0*1024 + c1*32 + c2. */
  def pack(c0: Int, c1: Int, c2: Int): Int = (c0 << 10) | (c1 << 5) | c2

  def compute(s: UTF8String): GenericArrayData = {
    val b = s.toLowerCase.getBytes
    // normalized symbol stream: 0 for space, 1..26 for letters
    val syms = new Array[Int](b.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c >= 'a' && c <= 'z') {
        if (pendingSpace && n > 0) { syms(n) = 0; n += 1 } // interior separator only
        pendingSpace = false
        syms(n) = c - 'a' + 1; n += 1
      } else {
        pendingSpace = true // runs collapse; leading/trailing never emitted
      }
      i += 1
    }
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 2)
    var j = 0
    while (j < n - 2) {
      out(j) = pack(syms(j), syms(j + 1), syms(j + 2))
      j += 1
    }
    new GenericArrayData(out)
  }
}
