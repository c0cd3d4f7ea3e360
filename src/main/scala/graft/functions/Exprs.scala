package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native `Column`-expression replacements for the reference's Python UDFs and
  * the shared scalar helpers used across the operator library.
  *
  * The reference runs these as Python UDFs (a per-batch JVM→Python process hop
  * and a whole-stage-codegen barrier — reference
  * `src/pyspark/pipeline_pyspark.py:36-56`). Everything here is a pure
  * composition of built-in Catalyst expressions: codegen-friendly, pushdown-
  * transparent, and identical on 1 or 1000 executors.
  */
object Exprs {

  /** U1 — dirty-boolean normalization (reference `pipeline_pyspark.py:36-45`).
    *
    * Semantics are *type-directed*, mirroring the Python branch structure:
    *  - BooleanType: identity, null → false
    *  - numeric: `bool(v)` ⇒ v != 0, null → false
    *  - string: `str(v).strip().lower() ∈ {"1","true","yes","y","t"}`, null → false
    *
    * Note the trap (SURVEY §7.5): string "0.5" is FALSE (string path never
    * coerces numerics), while numeric 0.5 is TRUE.
    */
  def boolNorm(c: Column, dt: DataType): Column = dt match {
    case BooleanType    => coalesce(c, lit(false))
    case _: NumericType => coalesce(c =!= lit(0), lit(false))
    case _ =>
      // regexp strip, not trim(): Python str.strip() removes ALL whitespace
      // (tabs, newlines) while Spark's trim() removes only spaces — a
      // divergence found by the U1 property spec on "\ttrue\n".
      when(c.isNull, lit(false))
        .otherwise(lower(regexp_replace(c, "^\\s+|\\s+$", ""))
          .isin("1", "true", "yes", "y", "t"))
  }

  /** String-path boolNorm for a column already known to be a string. */
  def boolNormString(c: Column): Column = boolNorm(c, StringType)

  /** U2 — two-format timestamp parse → ISO date string (reference
    * `pipeline_pyspark.py:48-56`). Tries "yyyy-MM-dd HH:mm:ss" then
    * "yyyy-MM-dd"; result is the ISO date string. The reference *raises* on
    * unparseable input; callers wanting that fail-fast behavior should
    * `assertNotNull`-check the result (see [[orderDateStrStrict]]).
    */
  def orderDateStr(c: Column): Column =
    date_format(
      coalesce(
        try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
        try_to_timestamp(c, lit("yyyy-MM-dd"))),
      "yyyy-MM-dd")

  /** Fail-fast variant of U2: raises (like the Python UDF) when neither
    * format parses, instead of silently producing null.
    */
  def orderDateStrStrict(c: Column): Column = {
    val parsed = orderDateStr(c)
    when(c.isNotNull && parsed.isNull,
      raise_error(concat(lit("unparseable date: "), c))).otherwise(parsed)
  }

  // ---------------------------------------------------------------------------
  // Text primitives (word-count surface F4-F7 + LLM-pipeline text analysis)
  // ---------------------------------------------------------------------------

  /** Lowercase and strip everything but [a-z0-9] and whitespace
    * (reference `tutos/tuto_dataframes_pyspark(2).ipynb#13`).
    */
  def normText(c: Column): Column =
    regexp_replace(lower(c), "[^a-z0-9\\s]", " ")

  /** Whitespace tokenization with empty tokens dropped. */
  def words(c: Column): Column =
    filter(split(trim(c), "\\s+"), w => w =!= lit(""))

  /** `words(normText(c))` fused into the single-scan native
    * [[graft.functions.NormWords]] expression (semantics pinned equal by
    * NormWordsSpec).
    */
  def normWords(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NormWords(Bridge.expression(c)))
  }

  /** Fused per-document quality stats —
    * `struct(char_len, n_tokens, n_punct, n_stop)` in one allocation-free
    * scan (see [[graft.functions.TextStats]]). The composed equivalent
    * (regexp_replace for punct + interpreted HOF filter for stopwords) was
    * the sf1-convicted per-row cost of the quality family.
    */
  def textStats(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(TextStats(Bridge.expression(c)))
  }

  /** Langid char trigrams packed to ints in one scan (see
    * [[graft.functions.PackedTrigrams]]).
    */
  def packedTrigrams(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(PackedTrigrams(Bridge.expression(c)))
  }

  /** Token count (whitespace tokenizer). */
  def tokenCount(c: Column): Column = size(words(c))

  /** Canonical-form document fingerprint: md5 of the
    * whitespace-collapsed, trimmed, lowercased text. Identical logical
    * content (modulo spacing/case) maps to one 128-bit key — the key for
    * exact dedup at 100 TB (hash, not full text, is shuffled).
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** Engine-portable 60-bit hash: the first 15 hex digits of md5 parsed as
    * a long. Unlike xxhash64/murmur (Spark-specific), md5 is bit-identical
    * in every engine — DuckDB computes the same value as
    * `CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)` — so operators built on
    * it (MinHash, SimHash, winnowing, hash sampling) are fully
    * oracle-checkable AND reproducible across re-ingestions, which is the
    * property a curation pipeline actually needs from its hashes. 15 hex
    * digits (60 bits) keep the value inside a signed 64-bit long in both
    * engines.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles over a tokenized array (for Jaccard/MinHash dedup).
    * Returns empty array when there are fewer than n tokens.
    */
  def shingles(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n), i =>
        concat_ws(" ", (1 to n).map(k => element_at(ws, i + k)): _*)))
      .otherwise(array().cast(ArrayType(StringType)))

  // ---------------------------------------------------------------------------
  // Vector primitives (embedding similarity; Array[Float] columns)
  // ---------------------------------------------------------------------------

  /** Cast a float-array column to double elements (exact widening) so all
    * arithmetic below is double-precision and deterministic.
    */
  def vecAsDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Sequential-fold dot product — same accumulation order as a scalar loop,
    * so results are bit-reproducible across engines and partitionings.
    * Backed by the codegen'd [[DotProduct]] expression: the higher-order
    * `aggregate(zip_with(...))` equivalent runs through interpreted lambdas
    * (a whole-stage-codegen hole) and was 25× slower in the all-pairs
    * cosine join.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      DotProduct(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))
}
