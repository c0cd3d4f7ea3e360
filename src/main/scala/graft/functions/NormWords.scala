package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Normalized word tokenization as ONE native expression:
  * `filter(split(trim(regexp_replace(lower(text), "[^a-z0-9\\s]", " ")), "\\s+"), _ != "")`
  * — the chain at the head of nearly every text/dedup query — collapsed
  * into a single byte scan.
  *
  * Equivalence: after the regex pass the string contains only `[a-z0-9]`
  * and whitespace, so the split's tokens are exactly the MAXIMAL RUNS of
  * `[a-z0-9]` characters in the lowercased text. The scan emits those runs
  * directly. Every non-run byte is a separator in both formulations — the
  * regex turns it into ' ' and the split consumes it; the scan just skips
  * it — including multi-byte UTF-8 sequences (all bytes ≥ 0x80, never in a
  * run; a 2-byte 'é' costs the regex one space and the scan two skipped
  * bytes, and the token sequence is identical). Pinned by
  * NormWordsSpec's property test against the regex chain.
  *
  * Why: the regex chain runs two java.util.regex machines plus an
  * intermediate string allocation per row; this is one pass over the
  * lowered bytes with zero-copy `UTF8String` slices, and it keeps the
  * surrounding stage in whole-stage codegen (one static call, no
  * interpreted HOF filter).
  */
case class NormWords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "norm_words"

  override protected def nullSafeEval(input: Any): Any =
    NormWords.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormWords.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormWords =
    copy(child = newChild)
}

object NormWords {
  /** Maximal [a-z0-9] byte runs of the lowercased input, as array<string>.
    * Called from generated code (static forwarder).
    */
  def compute(s: UTF8String): GenericArrayData = {
    val lower = s.toLowerCase
    val b = lower.getBytes
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    var start = -1
    while (i < b.length) {
      val c = b(i)
      val isTok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (isTok) { if (start < 0) start = i }
      else if (start >= 0) {
        out.add(UTF8String.fromBytes(b, start, i - start)); start = -1
      }
      i += 1
    }
    if (start >= 0) out.add(UTF8String.fromBytes(b, start, b.length - start))
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}
