package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The per-document quality-stat bundle as ONE native expression:
  * `struct(char_len, n_tokens, n_punct, n_stop)` where
  *
  *  - `char_len` = `length(text)` (codepoints of the ORIGINAL text),
  *  - `n_punct`  = codepoints NOT matching `[a-zA-Z0-9\s]` (Java `\s`,
  *    i.e. `length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))`),
  *  - `n_tokens` = `size(norm_words(text))` (maximal `[a-z0-9]` runs of the
  *    lowercased text — the [[NormWords]] tokenization),
  *  - `n_stop`   = `size(filter(norm_words(text), w -> w IN stopEn))` for the
  *    fixed 8-word English stop set shared by the quality/Gopher family.
  *
  * Why: the quality-score family (ta_quality, ta_curation) previously paid a
  * `java.util.regex` replace over the full text for `n_punct` PLUS an
  * interpreted higher-order `filter` for `n_stop` — the lambda breaks
  * whole-stage codegen for the entire projection, and both walk the text
  * again after [[NormWords]] already did. Convicted by the sf1 pairing
  * (BASELINE.md round 9: ta_quality 20.5× DuckDB with the gap GROWING in
  * data — a real per-row cost, not the task-launch floor). This expression
  * computes all four counters in two allocation-free byte scans (original
  * bytes for char_len/n_punct, lowered bytes for the token runs) without
  * materializing the token array at all, and stays inside whole-stage
  * codegen via a static call. Equivalence to the composed formulation is
  * pinned by TextStatsSpec's property test.
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("char_len", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  /** The fixed stop set of the quality/Gopher rule family (UTF-8 bytes,
    * compared against lowered token runs without allocating).
    */
  private val StopWords: Array[Array[Byte]] =
    Array("the", "a", "and", "of", "to", "in", "is", "it")
      .map(_.getBytes("UTF-8"))

  private def isStop(b: Array[Byte], start: Int, len: Int): Boolean = {
    var w = 0
    while (w < StopWords.length) {
      val sw = StopWords(w)
      if (sw.length == len) {
        var i = 0
        while (i < len && b(start + i) == sw(i)) i += 1
        if (i == len) return true
      }
      w += 1
    }
    false
  }

  /** Java `\s` for the single-byte range (space, \t, \n, \x0B, \f, \r) —
    * [[NormWords]]-side semantics; the class `[a-zA-Z0-9\s]` is ASCII-only,
    * so every multi-byte codepoint counts as punct.
    */
  private def isAsciiSpace(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  private def isAsciiAlnum(c: Byte): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** Called from generated code (static forwarder). */
  def compute(s: UTF8String): InternalRow = {
    // Pass 1 — original bytes: codepoint count + punct count. A codepoint is
    // one lead byte (anything but 0b10xxxxxx); single-byte codepoints check
    // the ASCII class, multi-byte ones are punct by definition of the class.
    val ob = s.getBytes
    var charLen = 0L
    var nPunct = 0L
    var i = 0
    while (i < ob.length) {
      val c = ob(i)
      if ((c & 0xc0) != 0x80) {
        charLen += 1
        if (c >= 0) { // single-byte (ASCII) codepoint
          if (!isAsciiAlnum(c) && !isAsciiSpace(c)) nPunct += 1
        } else nPunct += 1
      }
      i += 1
    }
    // Pass 2 — lowered bytes: maximal [a-z0-9] runs (the NormWords
    // tokenization), counting runs and stop-set membership in place.
    val lb = s.toLowerCase.getBytes
    var nTokens = 0L
    var nStop = 0L
    var start = -1
    i = 0
    while (i < lb.length) {
      val c = lb(i)
      val isTok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (isTok) { if (start < 0) start = i }
      else if (start >= 0) {
        nTokens += 1
        if (isStop(lb, start, i - start)) nStop += 1
        start = -1
      }
      i += 1
    }
    if (start >= 0) {
      nTokens += 1
      if (isStop(lb, start, lb.length - start)) nStop += 1
    }
    new GenericInternalRow(Array[Any](charLen, nTokens, nPunct, nStop))
  }
}
