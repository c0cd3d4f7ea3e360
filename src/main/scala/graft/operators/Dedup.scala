package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.QueryDef.sqlChecked
import graft.functions.Exprs

/** Deduplication operators for a training-data pipeline over `documents`:
  * exact (hash-groupBy), word-n-gram Jaccard, MinHash+LSH, and SimHash.
  *
  * Scale design (the point of each variant):
  *  - exact: shuffles a 16-byte fingerprint per doc, never the text;
  *  - n-gram Jaccard: exact pairwise overlap via a shingle-equality
  *    self-join — the correctness baseline, O(sum bucket²) pairs;
  *  - MinHash+LSH: fixed-width signature (K minhashes) per doc, candidate
  *    generation via band-bucket join — the 100 TB path: work is linear in
  *    docs + candidate pairs, never all-pairs;
  *  - SimHash: one 64-bit signature per doc, candidates via 16-bit band
  *    equality (any pair with hamming ≤ 3 shares a band by pigeonhole).
  *
  * MinHash/SimHash/winnowing hashes are [[Exprs.hash60]] (md5-derived, engine
  * portable), so all three are FULLY oracle-checked in DuckDB — the oracle
  * re-derives the signatures, bands, candidate joins, and verification from
  * scratch in SQL. Collision/robustness semantics are additionally pinned by
  * PlantedNearDupSpec and WinnowingSpec (planted near-duplicate documents
  * must collide, disjoint documents must not).
  */
object Dedup {

  /** Max document frequency a shingle may have and still generate candidate
    * pairs (the shingle self-join is quadratic in the hottest shingle's df).
    */
  val HotShingleDfCap = 128

  /** Sweep-scale input gate for the EXACT quadratic pair baselines
    * (dd_ppjoin / dd_containment / dd_lsh_eval's exact-truth side). These
    * queries are correct-by-construction oracle baselines whose cost is
    * intentionally output-bound — at the sf1 sweep they were 79% of the
    * whole suite's wall (r12 verdict #1). Above [[ExactPairsDocCap]]
    * documents they run on the deterministic `doc_id % ExactPairsStride = 0`
    * stratum instead of the full corpus: candidate/verify work drops
    * ~stride², the algorithms and their oracles are unchanged (the oracle
    * SQL replays the same corpus-size-dependent gate), and both driver
    * correctness scales (sf0.01 = 500 docs, sf0.1 = 5000) sit under the cap
    * so the hash-checked surface is byte-identical there. This is the
    * ann-benchmarks recall-eval methodology applied to exact-join truth:
    * estimate on a deterministic stratum, don't pay the full quadratic bill
    * at every scale. `final val` literals so oracle-SQL interpolation is
    * constant-folded regardless of object-init order.
    */
  final val ExactPairsDocCap = 10000
  final val ExactPairsStride = 4

  /** The ONE gate definition, parameterized by table/id column — the doc-
    * and vec-side baselines must sample by the same methodology, so the
    * cap/stride contract lives in exactly one place (each engine).
    */
  private def exactGateSql(table: String, idCol: String): String =
    s"((SELECT count(*) FROM $table) <= $ExactPairsDocCap OR $idCol % $ExactPairsStride = 0)"

  private def stratumAbove(df: DataFrame, idCol: String, n: Long): DataFrame =
    if (n > ExactPairsDocCap) df.filter(col(idCol) % ExactPairsStride === 0)
    else df

  /** SQL twin of the gate in [[exactPairsDocs]] — a WHERE predicate over
    * `documents` rows.
    */
  private final val ExactDocsGateSql: String = exactGateSql("documents", "doc_id")

  /** The corpus the exact quadratic baselines run on (see
    * [[ExactPairsDocCap]]). The count is a metadata-cheap 1-row action.
    */
  def exactPairsDocs(s: SparkSession, docs: DataFrame): DataFrame =
    exactPairsDocs(s, docs, docs.count())

  /** Overload threading a pre-computed count: the per-dir query closures
    * use [[documentsCount]] so the gate costs zero extra scans per run
    * (ADVICE r13 — the count action ran on every invocation, and
    * dd_lsh_eval ran a second independent one to pick its stride).
    */
  def exactPairsDocs(s: SparkSession, docs: DataFrame, n: Long): DataFrame =
    stratumAbove(docs, "doc_id", n)

  /** Memoized per-(dir, JVM) document count (the ivfIndexDir TrieMap
    * discipline) — the gate's only input, shared by every exact-baseline
    * call site instead of a fresh count() action each.
    *
    * IMMUTABILITY CONTRACT (ADVICE r14): the memo assumes a dir's tables
    * never change within one JVM — true for the driver's testdata dirs and
    * the bench/verify/sweep harnesses. A test that rewrites a dir in place
    * would evaluate the gate with a stale count (and so could diverge from
    * the oracle around the 10k boundary); planted-fixture specs therefore
    * pass FRAMES to the frame-parameterized cores (or fresh temp dirs),
    * never overwrite a memoized dir.
    */
  private val docCounts = scala.collection.concurrent.TrieMap.empty[String, Long]
  def documentsCount(s: SparkSession, dir: String): Long =
    docCounts.getOrElseUpdate(dir, Tables.documents(s, dir).count())

  /** The exact-pairs gate applied to the EMBEDDINGS table: the labeled
    * O(n²) all-pairs cosine baseline (dd_embedding_cosine) runs on the
    * `vec_id % ExactPairsStride = 0` stratum above [[ExactPairsDocCap]]
    * vectors — same cap, same stride, same oracle-mirrored shape as the
    * document-side gate, and both driver correctness scales (500 / 2,000
    * vectors) sit under the cap so the hash-checked surface is unchanged.
    * The LSH/semdedup paths are the scale story; the baseline exists to
    * grade them, and grading on a deterministic stratum is the sampled
    * ann-benchmarks methodology (id assignment is independent of vector
    * geometry in the fixture generator).
    */
  private[operators] final val ExactVecsGateSql: String =
    exactGateSql("embeddings", "vec_id")

  private val vecCounts = scala.collection.concurrent.TrieMap.empty[String, Long]
  def embeddingsCount(s: SparkSession, dir: String): Long =
    vecCounts.getOrElseUpdate(dir, Tables.embeddings(s, dir).count())

  def exactPairsVecs(s: SparkSession, emb: DataFrame, n: Long): DataFrame =
    stratumAbove(emb, "vec_id", n)

  /** Sliding-window width (tokens) for exact-substring duplicate-span
    * removal: shared spans ≥ this many tokens are detected and removed.
    */
  val SubstrWindow = 20

  /** DuckDB twin of `Exprs.normText + Exprs.words` as a CTE over documents. */
  private val ToksCte =
    """toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g')), '\s+'),
      |                w -> w <> '') AS w
      |  FROM documents)""".stripMargin

  /** DuckDB twin of `Exprs.hash60(expr)`. */
  private def sqlHash60(expr: String): String =
    s"CAST(('0x' || substr(md5($expr),1,15)) AS BIGINT)"

  /** The minhash pair pipeline as a reusable WITH-clause body ending in a
    * CTE `mh_pairs(doc_a, doc_b, jaccard)` — shared by the pair oracle and
    * the connected-components oracle.
    */
  private def minhashPairsCtes(k: Int, bands: Int, threshold: Double): String = {
    val rows = k / bands
    val minCols = (0 until k)
      .map(i => s"min((h1 + $i * h2) % $MinhashP) AS m$i")
      .mkString(",\n    ")
    val bandSelects = (0 until bands).map { b =>
      val cat = (b * rows until (b + 1) * rows)
        .map(i => s"CAST(m$i AS VARCHAR)").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($cat) AS bsig FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""$ToksCte,
       |sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-2),
       |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
       |    FROM toks WHERE len(w) >= 3)),
       |hh AS (
       |  SELECT doc_id,
       |    (${sqlHash60("'a:' || shingle")} % $MinhashP) AS h1,
       |    (${sqlHash60("'b:' || shingle")} % $MinhashP) AS h2
       |  FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |    $minCols
       |  FROM hh GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cands AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
       |shh AS (SELECT doc_id, ${sqlHash60("shingle")} AS h FROM sh),
       |counts AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
       |common AS (
       |  SELECT doc_a, doc_b, count(*) AS common
       |  FROM cands JOIN shh sa ON doc_a = sa.doc_id
       |             JOIN shh sb ON doc_b = sb.doc_id AND sa.h = sb.h
       |  GROUP BY doc_a, doc_b),
       |mh_pairs AS (
       |  SELECT doc_a, doc_b,
       |    round(common / CAST(ca.n + cb.n - common AS DOUBLE), 6) AS jaccard
       |  FROM common JOIN counts ca ON doc_a = ca.doc_id
       |              JOIN counts cb ON doc_b = cb.doc_id
       |  WHERE round(common / CAST(ca.n + cb.n - common AS DOUBLE), 6) >= $threshold)""".stripMargin
  }

  /** DuckDB oracle for [[minhashLshPairs]] — re-derives the K double-hashed
    * minhash signature, the banded bucket join, and the exact-Jaccard
    * verification entirely in SQL.
    */
  private def minhashOracle(k: Int, bands: Int, threshold: Double): String =
    s"""WITH ${minhashPairsCtes(k, bands, threshold)}
       |SELECT doc_a, doc_b, jaccard FROM mh_pairs
       |ORDER BY doc_a, doc_b""".stripMargin

  /** DuckDB oracle for [[componentsOf]] over the minhash near-dup graph:
    * transitive closure by recursive CTE, component id = min reachable
    * doc_id — an INDEPENDENT algorithm (path enumeration) from the Spark
    * side's label propagation, which is the strongest kind of oracle.
    */
  private def componentsOracle(k: Int, bands: Int, threshold: Double): String =
    s"""WITH RECURSIVE ${minhashPairsCtes(k, bands, threshold)},
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
       |  UNION SELECT doc_b, doc_a FROM mh_pairs),
       |reach AS (
       |  SELECT doc_id, doc_id AS r FROM documents
       |  UNION
       |  SELECT reach.doc_id, e.dst FROM reach JOIN edges e ON reach.r = e.src)
       |SELECT doc_id, min(r) AS component
       |FROM reach GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for [[simhashPairs]] — rebuilds the 60-bit vote-based
    * signature (60 generated per-bit sum terms), the 4×16-bit band join, and
    * the exact hamming filter.
    */
  private def simhashOracle(maxHamming: Int): String = {
    val sigTerms = (0 until 60).map(j =>
      s"(CASE WHEN SUM(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) > 0" +
        s" THEN (CAST(1 AS BIGINT) << $j) ELSE CAST(0 AS BIGINT) END)")
      .mkString("\n    + ")
    s"""WITH $ToksCte,
       |wrds AS (
       |  SELECT DISTINCT doc_id, word FROM (
       |    SELECT doc_id, unnest(w) AS word FROM toks)),
       |h AS (SELECT doc_id, ${sqlHash60("word")} AS h FROM wrds),
       |sig AS (
       |  SELECT doc_id,
       |    $sigTerms AS sig
       |  FROM h GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, sig, band, ((sig >> (band*16)) & 65535) AS v
       |  FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) b)
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  CAST(bit_count(xor(x.sig, y.sig)) AS BIGINT) AS hamming
       |FROM banded x JOIN banded y
       |  ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.sig, y.sig)) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** DuckDB oracle for [[winnowFingerprints]] — positional 3-gram hash
    * stream, per-window minima over complete windows, distinct.
    */
  private def winnowOracle(w: Int): String =
    s"""WITH $ToksCte,
       |idx AS (
       |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
       |  FROM toks WHERE len(w) >= 3),
       |hs AS (
       |  SELECT doc_id, i,
       |    ${sqlHash60("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")} AS h
       |  FROM idx),
       |wm AS (
       |  SELECT doc_id, i,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY i
       |                 ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp,
       |    count(*) OVER (PARTITION BY doc_id) AS n
       |  FROM hs)
       |SELECT DISTINCT doc_id, fp FROM wm WHERE i <= n - $w + 1
       |ORDER BY doc_id, fp""".stripMargin

  /** Distinct (doc_id, shingle) pairs. array_distinct runs per-row BEFORE the
    * explode, so the distinct needs no shuffle.
    */
  private[operators] def docShingles(s: SparkSession, dir: String, n: Int = 3): DataFrame =
    docShinglesOf(s, Tables.documents(s, dir), n)

  private[operators] def docShinglesOf(s: SparkSession, docs: DataFrame, n: Int): DataFrame = {
    import s.implicits._
    docs
      .select($"doc_id", Exprs.normWords($"text").as("w"))
      .filter(size($"w") >= n)
      .select($"doc_id", explode(array_distinct(Exprs.shingles($"w", n))).as("shingle"))
  }

  /** Modulus for the double-hashed MinHash family (Mersenne prime 2^31-1). */
  val MinhashP: Long = 2147483647L

  /** dd_minhash_incr arrival split: docs with doc_id ≡ 3 (mod 7) play the
    * newly-crawled batch; the rest are the already-indexed corpus.
    * Declared before `defs` (oracle-SQL init-order rule).
    */
  val IncrMod = 7
  val IncrRem = 3

  /** Write-once-per-(dir, JVM) MINHASH SIGNATURE INDEX of the existing
    * corpus (doc_id ≢ [[IncrRem]] mod [[IncrMod]]): the banded bucket rows
    * (doc_id, band, sig) as parquet. The incremental-ingest query joins an
    * arrival batch's buckets against this instead of re-hashing the corpus
    * — the production topology where each crawl snapshot extends a
    * persisted index.
    */
  private val minhashIndexDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def minhashIndexDir(s: SparkSession, dir: String): String =
    minhashIndexDirs.getOrElseUpdate(dir, graft.ColdBuilds.timed("dd_minhash_incr", dir) {
      import s.implicits._
      val p = java.nio.file.Files
        .createTempDirectory("graft-minhash-index").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete()
        }
        rm(new java.io.File(p))
      }))
      val existing = Tables.documents(s, dir)
        .filter($"doc_id" % IncrMod =!= IncrRem)
      val sig = minhashSignatures(docShinglesOf(s, existing, 3), 32)
      minhashBandBuckets(sig, 32, 8)
        .write.mode("overwrite").parquet(s"$p/buckets")
      p
    })

  /** New-vs-old pairs for ONE arrival batch against the persisted index —
    * shared by the batch and streaming faces of dd_minhash_incr. Every
    * pair couples one arrival with the fixed index, so the output over any
    * partitioning of arrivals into batches is the union of the per-batch
    * outputs (batch-split-invariant; IncrDedupSpec pins it).
    */
  /** One AvailableNow pass of the arrival-dedup stream: parquet files
    * under `srcDir` (schema from the canonical documents table of
    * `tableDir`), each micro-batch deduped against the persisted signature
    * index and written to `outDir/batch=N`; `ckDir` carries the file-source
    * offsets, so a SECOND call with the same checkpoint processes only
    * files added since the first (IncrDedupSpec's restart pin). Exposed
    * for that spec; dd_minhash_incr_stream is this over the single
    * committed documents file.
    */
  def incrStreamPass(
      s: SparkSession, srcDir: String, glob: Option[String],
      outDir: String, ckDir: String, tableDir: String): Unit = {
    import s.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val schema = s.read.parquet(s"$tableDir/documents.parquet").schema
    val reader = s.readStream.schema(schema)
    glob.foreach(g => reader.option("pathGlobFilter", g))
    reader.option("maxFilesPerTrigger", 1).parquet(srcDir)
      .filter($"doc_id" % IncrMod === IncrRem)
      .writeStream
      .option("checkpointLocation", ckDir)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          incrementalMinhashPairs(s, batch, tableDir)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
  }

  def incrementalMinhashPairs(
      s: SparkSession, arrivals: DataFrame, dir: String): DataFrame = {
    import s.implicits._
    val idxBuckets = s.read.parquet(s"${minhashIndexDir(s, dir)}/buckets")
    val shNew = docShinglesOf(s, arrivals, 3).cache()
    val newBuckets = minhashBandBuckets(minhashSignatures(shNew, 32), 32, 8)
    val cands = newBuckets.as("x")
      .join(idxBuckets.as("y"), $"x.band" === $"y.band" && $"x.sig" === $"y.sig")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()
    // verify re-reads ONLY candidate old docs (candidate-sized, not
    // corpus-sized), then the standard exact-Jaccard on hashed shingles.
    // candidate-sized cache: jaccardFor reads the shingle table three
    // times (counts + both join sides) — without it the semi-join +
    // re-shingle of the old docs would run per consumer
    val candOld = cands.select($"doc_b".as("doc_id")).distinct()
    val shOld = docShinglesOf(s,
      Tables.documents(s, dir).join(candOld, Seq("doc_id"), "left_semi"), 3)
      .cache()
    jaccardFor(cands, shNew.union(shOld))
      .filter($"jaccard" >= 0.5)
      .select($"doc_a".as("new_doc"), $"doc_b".as("old_doc"), $"jaccard")
  }

  /** Shared oracle for both faces: the all-pairs pipeline restricted to
    * mixed (new, old) pairs.
    */
  private val incrMinhashOracle =
    s"""WITH ${minhashPairsCtes(k = 32, bands = 8, threshold = 0.5)}
       |SELECT
       |  CASE WHEN doc_a % $IncrMod = $IncrRem THEN doc_a ELSE doc_b END AS new_doc,
       |  CASE WHEN doc_a % $IncrMod = $IncrRem THEN doc_b ELSE doc_a END AS old_doc,
       |  jaccard
       |FROM mh_pairs
       |WHERE (doc_a % $IncrMod = $IncrRem) <> (doc_b % $IncrMod = $IncrRem)
       |ORDER BY new_doc, old_doc""".stripMargin

  /** MinHash signature column m0..m{k-1} per doc from (doc_id, shingle).
    *
    * Hash family i is Kirsch-Mitzenmacher double hashing
    * (h1 + i*h2) mod p over TWO portable md5-derived base hashes — k
    * near-independent permutations for the price of 2 md5 calls per shingle
    * instead of k (the naive k-md5 version was 5× slower at sf0.1, all of it
    * hashing). p = 2^31-1 keeps every product inside a signed 64-bit long in
    * both engines, so the DuckDB oracle reproduces the family with plain
    * arithmetic.
    */
  private[operators] def minhashSignatures(sh: DataFrame, k: Int): DataFrame = {
    val h1 = Exprs.hash60(concat(lit("a:"), col("shingle"))) % MinhashP
    val h2 = Exprs.hash60(concat(lit("b:"), col("shingle"))) % MinhashP
    val hashed = sh.select(
      col("doc_id") +: (0 until k).map(i =>
        ((h1 + lit(i.toLong) * h2) % MinhashP).as(s"h$i")): _*)
    hashed.groupBy(col("doc_id"))
      .agg(min(col("h0")).as("m0"), (1 until k).map(i => min(col(s"h$i")).as(s"m$i")): _*)
  }

  /** Exact Jaccard for candidate pairs (doc_a, doc_b) given doc shingles.
    * The overlap join keys on hash60(shingle) longs, not the shingle
    * strings (hashed AFTER the per-doc distinct, mirrored in the oracle's
    * `shh` CTE — same engine-identical collision semantics as
    * dd_ngram_jaccard's keying).
    */
  private[operators] def jaccardFor(cands: DataFrame, sh: DataFrame): DataFrame =
    jaccardForHashed(cands,
      sh.select(col("doc_id"), Exprs.hash60(col("shingle")).as("h")))

  /** [[jaccardFor]] over an ALREADY-HASHED (doc_id, h) shingle frame —
    * callers holding a cached hashed table (dd_lsh_eval shares one between
    * the verify and the exact-truth side, r18) skip re-hashing per use.
    */
  private[operators] def jaccardForHashed(cands: DataFrame, shh: DataFrame): DataFrame = {
    val counts = shh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = cands
      .join(shh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(shh.as("sb"), col("doc_b") === col("sb.doc_id")
        && col("sa.h") === col("sb.h"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("common"))
    common
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("common").cast("double")
          / (col("ca.n") + col("cb.n") - col("common")), 6).as("jaccard"))
  }

  /** MinHash+LSH near-dup pairs over any (doc_id, text) DataFrame:
    * K-minhash signature per doc, banded bucket join for candidates, exact
    * Jaccard verify on candidates only. `threshold` is on verified Jaccard.
    */
  /** Banded bucket rows (doc_id, band, sig) from a K-column signature. */
  private[operators] def minhashBandBuckets(
      sig: DataFrame, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|",
          (b * rows until (b + 1) * rows).map(i => col(s"m$i").cast("string")): _*)).as("sig"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
  }

  /** Prefix-filtered EXACT Jaccard pairs at threshold 1/2 (see the
    * dd_ppjoin comment) — exposed for PpJoinSpec's brute-force equality.
    */
  def ppJoinPairs(s: SparkSession, docs: DataFrame): DataFrame =
    ppJoinPairsFrom(s, docs, None)

  /** [[ppJoinPairs]] with an optional pre-built HASHED shingle table
    * (columns doc_id, h — [[docShinglesOf]] output hashed, restricted to
    * exactly `docs`' documents). dd_lsh_eval passes its own cached table
    * (r18): the eval previously re-shingled and re-hashed the corpus a
    * second time inside the truth side of the same query. Per-doc
    * shingling is document-local, so a stratum's shingle table is the
    * filter of the full one — the caller's restriction is equivalence-
    * preserving by construction.
    */
  private[operators] def ppJoinPairsFrom(s: SparkSession, docs: DataFrame,
      shOpt: Option[DataFrame]): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // feeds the df rollup, the ordering join, both verify sides and the
    // size rollup — cache once; rows are (doc_id, 8-byte h), never text
    val sh = shOpt.getOrElse(docShinglesOf(s, docs, 3)
      .select($"doc_id", Exprs.hash60($"shingle").as("h"))
      .cache())
    val dfr = sh.groupBy($"h").agg(count(lit(1)).as("df"))
    val ordered = sh.join(dfr, Seq("h"))
      .withColumn("pos", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"df", $"h")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"doc_id")))
    // prefix length |x| − ⌈|x|/2⌉ + 1, all-integer so the cut is
    // bit-identical cross-engine
    val pref = ordered
      .filter($"pos" <= $"n" - expr("(n + 1) DIV 2") + 1)
      .select($"doc_id", $"h", $"n")
    val cand = pref.as("a")
      .join(pref.as("b"),
        $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id" &&
          $"b.n" * 2 >= $"a.n" && $"a.n" * 2 >= $"b.n")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    val com = cand
      .join(sh.as("x"), $"doc_a" === $"x.doc_id")
      .join(sh.as("y"), $"doc_b" === $"y.doc_id" && $"y.h" === $"x.h")
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("common"))
    val counts = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    com
      .join(counts.as("ca"), $"doc_a" === $"ca.doc_id")
      .join(counts.as("cb"), $"doc_b" === $"cb.doc_id")
      .withColumn("jaccard",
        round($"common".cast("double") / ($"ca.n" + $"cb.n" - $"common").cast("double"), 6))
      .filter($"jaccard" >= 0.5)
      .select($"doc_a", $"doc_b", $"common", $"jaccard")
  }

  /** Prefix-filtered EXACT containment pairs at threshold 3/4 (see the
    * dd_containment comment) — exposed for ContainmentSpec's brute-force
    * equality. Emits ORDERED pairs (doc_a, doc_b): doc_a's shingle set is
    * ≥ 3/4-contained in doc_b's.
    */
  def containmentPairs(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val sh = docShinglesOf(s, docs, 3)
      .select($"doc_id", Exprs.hash60($"shingle").as("h"))
      .cache()
    val dfr = sh.groupBy($"h").agg(count(lit(1)).as("df"))
    val ordered = sh.join(dfr, Seq("h"))
      .withColumn("pos", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"df", $"h")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"doc_id")))
    // containment prefix: if B misses ALL of A's first n − ⌈3n/4⌉ + 1
    // df-rarest tokens, then |A∩B| ≤ ⌈3n/4⌉ − 1 < (3/4)·n — so every
    // qualifying B shares a prefix token (completeness is a theorem)
    val pref = ordered
      .filter($"pos" <= $"n" - expr("(3 * n + 3) DIV 4") + 1)
      .select($"doc_id", $"h", $"n")
    // the probe side is B's FULL token index: containment is asymmetric,
    // so only the contained side gets a prefix cut; the size filter is
    // one-sided too (|A∩B| ≤ |B| ⇒ 4|B| ≥ 3|A|, no upper bound on B)
    val idx = ordered.select($"doc_id", $"h")
    val cand = pref.as("a")
      .join(idx.as("b"),
        $"a.h" === $"b.h" && $"a.doc_id" =!= $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"), $"a.n".as("na"))
      .distinct()
    val counts = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val sized = cand.join(counts.as("cb"), $"doc_b" === $"cb.doc_id")
      .filter($"cb.n" * 4 >= $"na" * 3)
      .select($"doc_a", $"doc_b", $"na")
    sized
      .join(sh.as("x"), $"doc_a" === $"x.doc_id")
      .join(sh.as("y"), $"doc_b" === $"y.doc_id" && $"y.h" === $"x.h")
      .groupBy($"doc_a", $"doc_b", $"na").agg(count(lit(1)).as("common"))
      .withColumn("containment",
        round($"common".cast("double") / $"na".cast("double"), 6))
      .filter($"containment" >= 0.75)
      .select($"doc_a", $"doc_b", $"common", $"containment")
  }

  def minhashLshPairs(
      s: SparkSession, docs: DataFrame,
      k: Int = 32, bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    import s.implicits._
    val sh = docShinglesOf(s, docs, 3).cache()
    val sig = minhashSignatures(sh, k)
    val buckets = minhashBandBuckets(sig, k, bands)
    val cands = buckets.as("x")
      .join(buckets.as("y"),
        $"x.band" === $"y.band" && $"x.sig" === $"y.sig" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()
    jaccardFor(cands, sh).filter($"jaccard" >= threshold)
  }

  /** dd_lsh_eval's measurement over an arbitrary documents-shaped frame —
    * exposed so LshEvalSpec can plant corpora at chosen similarity levels
    * (exact copies must yield recall 1.0; the subset identity
    * n_hit = |cands ∩ truth| must hold by construction) and so
    * LshEvalSampleSpec can force a `truthStride` and pin sampled-vs-full
    * recall agreement.
    *
    * The exact truth is [[ppJoinPairs]] — the SAME prefix-filter
    * formulation dd_ppjoin's oracle replays, so the Spark truth and the
    * oracle truth are one algorithm (previously the oracle used an
    * unconstrained all-pairs join whose round-into-threshold band the
    * prefix/size cut doesn't cover — a latent divergence, r12 advisory #1).
    * With `truthStride` > 1 the truth (and the recall numerator) is
    * restricted to the `doc_id % truthStride == 0` stratum: per-doc
    * signatures/bands/Jaccard are pairwise-local, so the restriction of the
    * full-corpus verified set to stratum pairs EQUALS the sampled run's —
    * stratum recall estimates full recall at ~stride² less truth-side work
    * (the ann-benchmarks sampled-recall methodology). The estimate is
    * unbiased only insofar as doc_id assignment is independent of
    * similarity structure (doc_id % stride is a deterministic stratum, not
    * a random sample — a corpus whose near-dup pairs correlate with id
    * layout, e.g. clones planted at adjacent ids, would bias it; the
    * testdata generator assigns ids independently of content, and
    * LshEvalSampleSpec pins stride-4 vs full agreement at sf0.1). Precision stays full-corpus: verification is
    * candidate-bounded, already the scale path.
    */
  def lshCandidateEval(
      s: SparkSession, docs: DataFrame, truthStride: Int = 1): DataFrame = {
    import s.implicits._
    val sh = docShinglesOf(s, docs, 3).cache()
    // ONE hashed shingle table shared by the verify side (three reads per
    // jaccardFor) AND the exact-truth side (r18): the eval previously
    // re-hashed the cached strings per consumer and re-shingled the whole
    // corpus again inside ppJoinPairs — md5 work, paid twice in one query.
    val shh = sh.select($"doc_id", Exprs.hash60($"shingle").as("h")).cache()
    val sig = minhashSignatures(sh, 32)
    val buckets = minhashBandBuckets(sig, 32, 8)
    val cands = buckets.as("x")
      .join(buckets.as("y"),
        $"x.band" === $"y.band" && $"x.sig" === $"y.sig" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct().cache()
    // the exact truth is independent of the LSH chain — overlap it with
    // the candidate/verify counts on a driver thread (guide §2.6; its
    // 3.5 s job previously serialized after ~3 s of LSH jobs)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val truthShh =
      if (truthStride > 1) shh.filter($"doc_id" % truthStride === 0) else shh
    val truthDocs =
      if (truthStride > 1) docs.filter($"doc_id" % truthStride === 0) else docs
    val nTrueF = Future(
      ppJoinPairsFrom(s, truthDocs, Some(truthShh)).count())
    val nCand = cands.count()
    val verified = jaccardForHashed(cands, shh).filter($"jaccard" >= 0.5).cache()
    val nVerified = verified.count()
    val nHit =
      if (truthStride > 1)
        verified
          .filter($"doc_a" % truthStride === 0 && $"doc_b" % truthStride === 0)
          .count()
      else nVerified
    val nTrue = Await.result(nTrueF, Duration.Inf) // the independent exact truth
    cands.unpersist(); verified.unpersist(); sh.unpersist(); shh.unpersist()
    Seq((nTrue, nCand, nVerified, nHit))
      .toDF("n_true", "n_cand", "n_verified", "n_hit")
      .select($"n_true", $"n_cand", $"n_verified", $"n_hit",
        // zero guards: a degenerate corpus (no candidates / no true pairs)
        // must yield NULL on both engines, not Spark NULL vs DuckDB inf
        when($"n_cand" > 0,
          round($"n_verified".cast("double") / $"n_cand".cast("double"), 6))
          .as("cand_precision"),
        when($"n_true" > 0,
          round($"n_hit".cast("double") / $"n_true".cast("double"), 6))
          .as("lsh_recall"))
  }

  /** Hyperplane-LSH near-dup pairs over any (vec_id, v: array&lt;double&gt;)
    * DataFrame: bucket-equality candidates in any of L tables at the tight
    * near-dup operating point ([[HyperplaneLsh.DedupPlanes]] — see there for
    * the collision math), exact cosine verification on candidates only.
    * Output: (id_a, id_b, cos) with cos rounded to 6 and ≥ `threshold`.
    * Reused by LshRecallSpec on a clustered fixture.
    */
  def embeddingLshPairs(
      s: SparkSession, vectors: DataFrame, threshold: Double,
      tables: Int = HyperplaneLsh.DedupTables,
      planes: Int = HyperplaneLsh.DedupPlanes): DataFrame = {
    import s.implicits._
    val e = vectors.withColumn("nrm", Exprs.l2norm($"v"))
    val buckets = HyperplaneLsh.bucketed(e, $"v", tables, planes)
      .select($"vec_id", $"lsh_table", $"lsh_bucket")
    val cands = buckets.as("x")
      .join(buckets.as("y"),
        $"x.lsh_table" === $"y.lsh_table" && $"x.lsh_bucket" === $"y.lsh_bucket"
          && $"x.vec_id" < $"y.vec_id")
      .select($"x.vec_id".as("id_a"), $"y.vec_id".as("id_b"))
      .distinct()
    cands
      .join(e.as("a"), $"id_a" === $"a.vec_id")
      .join(e.as("b"), $"id_b" === $"b.vec_id")
      .select($"id_a", $"id_b",
        round(Exprs.dot($"a.v", $"b.v") / ($"a.nrm" * $"b.nrm"), 6).as("cos"))
      .filter($"cos" >= threshold)
  }

  /** SimHash-64 near-dup pairs over any (doc_id, text) DataFrame: one 64-bit
    * signature per doc from per-word hash votes (custom
    * [[graft.functions.SimHashAgg]] imperative aggregate — one 256-byte
    * buffer per group instead of 64 sum columns), candidates via 4×16-bit
    * band equality (pigeonhole: hamming ≤ 3 ⇒ some band equal), exact
    * hamming filter on candidates.
    */
  def simhashPairs(s: SparkSession, docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    import s.implicits._
    val words = docs
      .select($"doc_id", explode(Exprs.normWords($"text")).as("word"))
      .distinct()
      .select($"doc_id", Exprs.hash60($"word").as("h"))
    val sigs = words.groupBy($"doc_id")
      .agg(graft.functions.SimHashAgg($"h").as("sig"))
    val chunks = (0 until 4).map { c =>
      struct(lit(c).as("chunk"),
        shiftrightunsigned($"sig", c * 16).bitwiseAND(lit(0xFFFFL)).as("v"))
    }
    val banded = sigs.select($"doc_id", $"sig", explode(array(chunks: _*)).as("bk"))
      .select($"doc_id", $"sig", $"bk.chunk".as("chunk"), $"bk.v".as("v"))
    banded.as("x")
      .join(banded.as("y"),
        $"x.chunk" === $"y.chunk" && $"x.v" === $"y.v" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
        expr("bit_count(x.sig ^ y.sig)").cast("long").as("hamming"))
      .distinct()
      .filter($"hamming" <= maxHamming)
  }

  /** Winnowed fingerprint set per document: distinct per-window minima of
    * the rolling 3-gram hash stream (window w=4).
    */
  def winnowFingerprints(s: SparkSession, docs: DataFrame, w: Int = 4): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val hashes = docs
      .select($"doc_id", Exprs.normWords($"text").as("ws"))
      .filter(size($"ws") >= 3)
      .select($"doc_id", posexplode(Exprs.shingles($"ws", 3)).as(Seq("pos", "shingle")))
      .select($"doc_id", $"pos", Exprs.hash60($"shingle").as("h"))
    val win = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(0, w - 1)
    hashes
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"doc_id")))
      .withColumn("fp", min($"h").over(win))
      // only complete windows select a fingerprint (pos ≤ n-w)
      .filter($"pos" <= $"n" - w)
      .select($"doc_id", $"fp")
      .distinct()
  }

  /** Connected components over an undirected pair graph by min-label
    * propagation WITH pointer doubling: every node starts labeled with
    * itself; each round, a node takes the minimum of (a) its own label,
    * (b) its neighbors' labels, and (c) its label's label — the
    * Shiloach–Vishkin shortcutting step. (b) alone converges in
    * O(component diameter) rounds; (c) halves the remaining pointer depth
    * each round, so the fixpoint arrives in O(log diameter) — the fix for
    * the r06 ScaleSmoke finding that components cost 3.0× at 8× rows purely
    * because duplicate families got DEEPER (VERDICT r06 #4; the same rounds
    * bound the large-star/small-star formulation achieves, with one
    * labels⋈labels hash join instead of re-materializing the edge set each
    * round).
    *
    * This is THE missing step between near-dup PAIR detection and actual
    * deduplication: LSH emits pairs, but "keep one per duplicate group"
    * needs the transitive closure (a~b, b~c ⇒ {a,b,c} is one group). Scale:
    * each round is two equi-joins + one aggregate on doc_id — no transitive
    * closure materialization (closure is O(n·component_size); labels are
    * O(n)). Deterministic (min is order-independent), so oracle-checkable.
    */
  def componentsOf(
      s: SparkSession, nodes: DataFrame, pairs: DataFrame,
      maxRounds: Int = 20): DataFrame = {
    import s.implicits._
    // materialize the (small) edge list once: every round joins it, and
    // re-deriving it would re-run the whole pair pipeline per round
    val edges = pairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
      .union(pairs.select($"doc_b".as("src"), $"doc_a".as("dst")))
      .cache()
    edges.count()
    // localCheckpoint (not cache): labels feeds FOUR plan subtrees per round
    // (nbrMin, both sides of the pointer-doubling self-join, and the carry),
    // so un-truncated lineage grows 4^rounds and analysis itself OOMs near
    // round 10 — checkpointing cuts the logical plan to the materialized
    // partitions each round. (On a cluster this is the reliable-checkpoint
    // slot; iterate-over-plans loops need lineage truncation either way.)
    var labels = nodes.select($"doc_id", $"doc_id".as("component")).localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val nbrMin = edges
        .join(labels, $"src" === $"doc_id")
        .groupBy($"dst").agg(min($"component").as("nbr_min"))
      // pointer doubling: each node also looks up its LABEL's current label
      // (labels is keyed by doc_id and labels are node ids, so this is a
      // self-join). Monotone (labels only decrease), so correctness of the
      // min fixpoint is unchanged — only the round count drops.
      val grand = labels.as("a")
        .join(labels.as("b"), $"a.component" === $"b.doc_id")
        .select($"a.doc_id".as("g_id"), $"b.component".as("grand_min"))
      // convergence flag computed in the SAME pass that builds the next
      // labels — no second join per round
      val next = labels
        .join(nbrMin, $"doc_id" === $"dst", "left")
        .join(grand, $"doc_id" === $"g_id", "left")
        .select($"doc_id",
          least(
            $"component",
            coalesce($"nbr_min", $"component"),
            coalesce($"grand_min", $"component")).as("component"),
          (($"nbr_min".isNotNull && $"nbr_min" < $"component") ||
            ($"grand_min".isNotNull && $"grand_min" < $"component")).as("chg"))
        .localCheckpoint(true)
      converged = next.filter($"chg").isEmpty
      labels = next.drop("chg")
      round += 1
    }
    require(converged, s"label propagation did not converge in $maxRounds rounds")
    labels
  }

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: group on the canonical-form fingerprint, keep min doc_id.
    sqlChecked(
      "dd_exact",
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash,
        | min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY content_hash ORDER BY keep_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy(Exprs.fingerprint($"text").as("content_hash"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .transform(d => QueryDef.largeSort(d, $"keep_id"))
    },

    // Word-3-gram Jaccard near-dup pairs over DISCRIMINATIVE shingles:
    // shingles with document frequency > HotShingleDfCap are dropped before
    // anything else, and jaccard is defined over the remaining (cold)
    // shingle sets. The cap bounds the self-join fan-out by df_cap² per
    // shingle — without it, one stop-phrase shingle shared by 1M docs
    // produces 10^12 pairs at 100 TB. Dropping hot shingles from the
    // DENOMINATOR too (not just candidate generation) keeps the operator a
    // single self-join + group-by — no second verification pass over the
    // full sets, which costs a candidates×shingles blow-up. Tradeoff,
    // documented: similarity contributed by ubiquitous shingles is ignored —
    // which is also why the capped jaccard is the better near-DUPLICATE
    // signal. The cap is mirrored in the oracle so the semantics stay pinned
    // at any df; on the testdata (max df 25) the output equals the uncapped
    // result.
    //
    // Join keys are hash60(shingle) LONGS, not the ~25-byte shingle strings:
    // the df rollup and the self-join shuffle 8-byte keys (the "shuffle
    // hashes, never text" rule the other dedup operators follow). Hashing
    // happens AFTER the per-doc string-distinct in BOTH engines, so the
    // (astronomically unlikely, ~n²/2^61) hash collision behaves identically
    // cross-engine and the oracle row still pins exact semantics.
    sqlChecked(
      "dd_ngram_jaccard",
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')), '\\s+'),
        |                w -> w <> '') AS w
        |  FROM documents),
        |sh0 AS (
        |  SELECT doc_id, ${sqlHash60("shingle")} AS h FROM (
        |    SELECT DISTINCT doc_id, shingle FROM (
        |      SELECT doc_id,
        |        unnest(list_transform(generate_series(1, len(w)-2),
        |                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        |      FROM toks WHERE len(w) >= 3))),
        |sh AS (
        |  SELECT doc_id, h FROM sh0
        |  WHERE h NOT IN (
        |    SELECT h FROM sh0 GROUP BY h HAVING count(*) > $HotShingleDfCap)),
        |counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, common,
        |  round(common / CAST(ca.n + cb.n - common AS DOUBLE), 6) AS jaccard
        |FROM pairs JOIN counts ca ON doc_a = ca.doc_id
        |           JOIN counts cb ON doc_b = cb.doc_id
        |WHERE round(common / CAST(ca.n + cb.n - common AS DOUBLE), 6) >= 0.2
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sh0 = docShingles(s, dir).select($"doc_id", Exprs.hash60($"shingle").as("h"))
      val hot = sh0.groupBy($"h").agg(count(lit(1)).as("df"))
        .filter($"df" > HotShingleDfCap).select($"h")
      val sh = sh0.join(hot, Seq("h"), "left_anti").cache()
      val counts = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      val pairs = sh.as("a")
        .join(sh.as("b"), $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
        .agg(count(lit(1)).as("common"))
      pairs
        .join(counts.as("ca"), $"doc_a" === $"ca.doc_id")
        .join(counts.as("cb"), $"doc_b" === $"cb.doc_id")
        .withColumn("jaccard",
          round($"common".cast("double") / ($"ca.n" + $"cb.n" - $"common").cast("double"), 6))
        .filter($"jaccard" >= 0.2)
        .select($"doc_a", $"doc_b", $"common", $"jaccard")
        .transform(d => QueryDef.largeSort(d, $"doc_a", $"doc_b"))
    },

    // EXACT set-similarity join via PREFIX FILTERING (All-Pairs, Bayardo
    // et al. 2007; PPJoin, Xiao et al. 2008) — the third Jaccard-pair
    // regime: dd_ngram_jaccard is the df-capped heuristic baseline (drops
    // hot-shingle similarity mass), dd_minhash_lsh is probabilistic;
    // THIS one is exact AND subquadratic, with completeness a THEOREM:
    // order every doc's shingle set by ascending global df (rare first);
    // if J(x,y) ≥ t then |x∩y| ≥ ⌈t·|x|⌉, so the first
    // |x| − ⌈t·|x|⌉ + 1 tokens of BOTH docs must share an element — the
    // candidate join runs on PREFIX tokens only, which by construction
    // are the rarest (low df ⇒ tiny join fan-out; a stop-phrase shingle
    // lands in nobody's prefix — the cap heuristic made exact). A length
    // filter (t·|x| ≤ |y| ≤ |x|/t, exact in integers for t=1/2) prunes
    // size-incompatible pairs inside the join; only candidates reach the
    // full-set intersection verify. t = 0.5 (the dd_minhash verify
    // threshold); all ceils are integer ((n+1) DIV 2), so the prefix cut
    // is bit-identical cross-engine. Scale: one h-keyed df rollup, one
    // doc-keyed ordering window, a low-df prefix self-join on 8-byte
    // keys, candidate-sized verify — corpus text never shuffles.
    // PpJoinSpec pins EQUALITY with the brute-force all-pairs join (not
    // recall — exactness).
    sqlChecked(
      "dd_ppjoin",
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')), '\\s+'),
        |                w -> w <> '') AS w
        |  FROM documents WHERE $ExactDocsGateSql),
        |sh AS (
        |  SELECT doc_id, ${sqlHash60("shingle")} AS h FROM (
        |    SELECT DISTINCT doc_id, shingle FROM (
        |      SELECT doc_id,
        |        unnest(list_transform(generate_series(1, len(w)-2),
        |                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        |      FROM toks WHERE len(w) >= 3))),
        |df AS (SELECT h, count(*) AS df FROM sh GROUP BY h),
        |ordered AS (
        |  SELECT doc_id, h,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY df, h) AS pos,
        |    count(*) OVER (PARTITION BY doc_id) AS n
        |  FROM sh JOIN df USING (h)),
        |pref AS (SELECT doc_id, h, n FROM ordered WHERE pos <= n - (n + 1) // 2 + 1),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM pref a JOIN pref b ON a.h = b.h AND a.doc_id < b.doc_id
        |  WHERE 2 * b.n >= a.n AND 2 * a.n >= b.n),
        |com AS (
        |  SELECT doc_a, doc_b, count(*) AS common
        |  FROM cand JOIN sh x ON x.doc_id = doc_a
        |            JOIN sh y ON y.doc_id = doc_b AND y.h = x.h
        |  GROUP BY doc_a, doc_b),
        |counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
        |SELECT doc_a, doc_b, common,
        |  round(common / CAST(ca.n + cb.n - common AS DOUBLE), 6) AS jaccard
        |FROM com JOIN counts ca ON doc_a = ca.doc_id
        |         JOIN counts cb ON doc_b = cb.doc_id
        |WHERE round(common / CAST(ca.n + cb.n - common AS DOUBLE), 6) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      QueryDef.largeSort(
        ppJoinPairs(s, exactPairsDocs(s, Tables.documents(s, dir),
          documentsCount(s, dir))),
        $"doc_a", $"doc_b")
    },

    // EXACT set-CONTAINMENT join at C(a→b) = |Sa∩Sb|/|Sa| ≥ 3/4 — the
    // ASYMMETRIC twin of dd_ppjoin's Jaccard: detects documents whose
    // shingle set is (mostly) a subset of another's — quotation pages,
    // boilerplate-wrapped copies, truncated mirrors — which symmetric
    // Jaccard MISSES outright (a small doc inside a big one has tiny J but
    // containment ≈ 1; the standard crawl-dedup blind spot). Same
    // rare-token prefix discipline, adapted to asymmetry: only the
    // CONTAINED side gets a prefix cut (if B misses all of A's
    // n − ⌈3n/4⌉ + 1 df-rarest tokens, |A∩B| < 3n/4 — completeness is a
    // theorem), probed against B's FULL token index, with the one-sided
    // size filter 4|B| ≥ 3|A|. Verify is candidate-sized exact
    // intersection counting on 8-byte keys; text never shuffles.
    // ContainmentSpec pins EQUALITY with the brute-force all-pairs join,
    // including a planted slice-of-another doc.
    sqlChecked(
      "dd_containment",
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')), '\\s+'),
        |                w -> w <> '') AS w
        |  FROM documents WHERE $ExactDocsGateSql),
        |sh AS (
        |  SELECT doc_id, ${sqlHash60("shingle")} AS h FROM (
        |    SELECT DISTINCT doc_id, shingle FROM (
        |      SELECT doc_id,
        |        unnest(list_transform(generate_series(1, len(w)-2),
        |                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        |      FROM toks WHERE len(w) >= 3))),
        |df AS (SELECT h, count(*) AS df FROM sh GROUP BY h),
        |ordered AS (
        |  SELECT doc_id, h,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY df, h) AS pos,
        |    count(*) OVER (PARTITION BY doc_id) AS n
        |  FROM sh JOIN df USING (h)),
        |pref AS (SELECT doc_id, h, n FROM ordered WHERE pos <= n - (3 * n + 3) // 4 + 1),
        |counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na
        |  FROM pref a JOIN ordered b ON a.h = b.h AND a.doc_id <> b.doc_id
        |  WHERE 4 * b.n >= 3 * a.n),
        |com AS (
        |  SELECT doc_a, doc_b, na, count(*) AS common
        |  FROM cand JOIN sh x ON x.doc_id = doc_a
        |            JOIN sh y ON y.doc_id = doc_b AND y.h = x.h
        |  GROUP BY doc_a, doc_b, na)
        |SELECT doc_a, doc_b, common,
        |  round(common / CAST(na AS DOUBLE), 6) AS containment
        |FROM com
        |WHERE round(common / CAST(na AS DOUBLE), 6) >= 0.75
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      QueryDef.largeSort(
        containmentPairs(s, exactPairsDocs(s, Tables.documents(s, dir),
          documentsCount(s, dir))),
        $"doc_a", $"doc_b")
    },

    // MinHash (K=32) + LSH (8 bands × 4 rows) candidate pairs, then exact
    // Jaccard verification of candidates only. Signature build is one
    // map-side-combinable aggregate; bucket join touches only colliding docs.
    // Fully oracle-checked: the portable md5-based hash lets DuckDB re-derive
    // signatures, bands, and verification independently.
    sqlChecked("dd_minhash_lsh", minhashOracle(k = 32, bands = 8, threshold = 0.5)) { (s, dir) =>
      import s.implicits._
      QueryDef.largeSort(
        minhashLshPairs(s, Tables.documents(s, dir)), $"doc_a", $"doc_b")
    },

    // IN-ENGINE LSH QUALITY EVAL (the sim_recall_eval discipline brought
    // to the dedup family): how good is the banded-MinHash CANDIDATE
    // stage, measured against the exact threshold-1/2 truth that
    // dd_ppjoin's prefix filter computes with completeness a theorem?
    // Reports the three set sizes plus candidate precision (verification
    // work that paid off) and LSH recall (true pairs whose bands collided
    // — the S-curve's integral over the corpus' actual similarity
    // distribution, the number a pipeline needs before trusting banded
    // dedup at 100 TB where exact verification of everything is
    // unaffordable). The oracle replays the LSH stages via the shared CTE
    // chain and the truth via the SAME prefix-filter formulation as
    // dd_ppjoin's oracle (tsh..tp below) over the ExactDocsGateSql stratum —
    // at the driver correctness scales the gate passes every doc (full
    // truth); above the cap the truth runs on the doc_id % 4 stratum and
    // lsh_recall becomes the sampled-recall estimate (n_hit counts verified
    // pairs with BOTH ends in the stratum; see lshCandidateEval's scaladoc
    // for why the restriction equals the sampled run).
    sqlChecked(
      "dd_lsh_eval",
      s"""WITH ${minhashPairsCtes(k = 32, bands = 8, threshold = 0.5)},
        |tsh AS (SELECT doc_id, h FROM shh WHERE $ExactDocsGateSql),
        |tdf AS (SELECT h, count(*) AS df FROM tsh GROUP BY h),
        |tord AS (
        |  SELECT doc_id, h,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY df, h) AS pos,
        |    count(*) OVER (PARTITION BY doc_id) AS n
        |  FROM tsh JOIN tdf USING (h)),
        |tpref AS (SELECT doc_id, h, n FROM tord WHERE pos <= n - (n + 1) // 2 + 1),
        |tcand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM tpref a JOIN tpref b ON a.h = b.h AND a.doc_id < b.doc_id
        |  WHERE 2 * b.n >= a.n AND 2 * a.n >= b.n),
        |tcom AS (
        |  SELECT doc_a, doc_b, count(*) AS common
        |  FROM tcand JOIN tsh x ON x.doc_id = doc_a
        |             JOIN tsh y ON y.doc_id = doc_b AND y.h = x.h
        |  GROUP BY doc_a, doc_b),
        |tcnt AS (SELECT doc_id, count(*) AS n FROM tsh GROUP BY doc_id),
        |tp AS (
        |  SELECT doc_a, doc_b FROM tcom
        |  JOIN tcnt ca ON doc_a = ca.doc_id JOIN tcnt cb ON doc_b = cb.doc_id
        |  WHERE round(common / CAST(ca.n + cb.n - common AS DOUBLE), 6) >= 0.5),
        |hit AS (
        |  SELECT doc_a, doc_b FROM mh_pairs
        |  WHERE ((SELECT count(*) FROM documents) <= $ExactPairsDocCap
        |         OR (doc_a % $ExactPairsStride = 0 AND doc_b % $ExactPairsStride = 0))),
        |m AS (SELECT
        |  (SELECT count(*) FROM tp) AS n_true,
        |  (SELECT count(*) FROM cands) AS n_cand,
        |  (SELECT count(*) FROM mh_pairs) AS n_verified,
        |  (SELECT count(*) FROM hit) AS n_hit)
        |SELECT CAST(n_true AS BIGINT) AS n_true,
        |  CAST(n_cand AS BIGINT) AS n_cand,
        |  CAST(n_verified AS BIGINT) AS n_verified,
        |  CAST(n_hit AS BIGINT) AS n_hit,
        |  CASE WHEN n_cand > 0
        |    THEN round(CAST(n_verified AS DOUBLE) / n_cand, 6) END AS cand_precision,
        |  CASE WHEN n_true > 0
        |    THEN round(CAST(n_hit AS DOUBLE) / n_true, 6) END AS lsh_recall
        |FROM m""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val stride =
        if (documentsCount(s, dir) > ExactPairsDocCap) ExactPairsStride else 1
      lshCandidateEval(s, docs, stride)
    },

    // INCREMENTAL ingest dedup — the production topology dd_minhash_lsh's
    // one-shot form doesn't show: the existing corpus' banded signatures
    // live in a persisted index ([[minhashIndexDir]]); an arrival batch
    // (doc_id ≡ 3 mod 7, ~14% of docs) is hashed, its buckets join the
    // INDEX buckets (never corpus text), and only candidate old docs are
    // re-shingled for the exact-Jaccard verify. At 100 TB: each crawl
    // snapshot hashes only its arrivals, the index grows by append, and
    // the verify re-reads a candidate-sized slice of the corpus. The
    // oracle replays the all-pairs pipeline and keeps exactly the mixed
    // (new, old) pairs — the incremental path must reproduce it verbatim.
    sqlChecked(
      "dd_minhash_incr",
      incrMinhashOracle) { (s, dir) =>
      import s.implicits._
      incrementalMinhashPairs(s,
          Tables.documents(s, dir).filter($"doc_id" % IncrMod === IncrRem), dir)
        .transform(d => QueryDef.largeSort(d, $"new_doc", $"old_doc"))
    },

    // The STREAMING face of incremental ingest dedup (the ev_ ↔ dd_
    // bridge): arrivals flow in as a file stream; each micro-batch is
    // independently deduped against the persisted index inside
    // `foreachBatch` and appended under a batchId-keyed partition (the
    // ev_stream_upsert idempotent-sink pattern — a replayed batch
    // overwrites its own partition). Because every pair is (one arrival ×
    // the fixed index), the result is batch-split-INVARIANT by
    // construction — any partitioning of arrivals into micro-batches
    // yields the same union (IncrDedupSpec pins the property on a 2-way
    // split) — so the oracle is the batch twin's. At 100 TB this IS the
    // production shape: a crawl feed dedups continuously, paying O(batch)
    // per trigger, state lives in the index, not the stream.
    sqlChecked(
      "dd_minhash_incr_stream",
      incrMinhashOracle) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.streaming.Trigger
      val outDir = java.nio.file.Files
        .createTempDirectory("dd-incr-stream-out").toString
      val ckDir = java.nio.file.Files
        .createTempDirectory("dd-incr-stream-ck").toString
      incrStreamPass(s, dir, Some("documents.parquet"), outDir, ckDir, dir)
      s.read.option("basePath", outDir).parquet(s"$outDir/batch=*")
        .select($"new_doc", $"old_doc", $"jaccard")
        .transform(d => QueryDef.largeSort(d, $"new_doc", $"old_doc"))
    },

    // SimHash near-dup: one 60-bit vote-based signature per doc from word
    // hashes (custom SimHashAgg imperative aggregate), candidate pairs via
    // 4×16-bit band equality (pigeonhole: hamming ≤ 3 ⇒ some band equal),
    // exact hamming filter on candidates. Oracle rebuilds the signature from
    // 60 per-bit vote sums in SQL.
    sqlChecked("dd_simhash", simhashOracle(maxHamming = 3)) { (s, dir) =>
      import s.implicits._
      QueryDef.largeSort(
        simhashPairs(s, Tables.documents(s, dir)), $"doc_a", $"doc_b")
    },

    // Embedding-cosine near-dup pairs — exact all-pairs baseline (the LSH
    // scale path is dd_embedding_lsh below). Labeled O(n²): correct-by-
    // construction reference the LSH variant's recall is measured against,
    // like dd_ngram_jaccard is for MinHash. Norms are computed ONCE per
    // vector before the join (not per pair) and the pair dot product is the
    // codegen'd DotProduct expression, so the per-pair cost is one 64-step
    // fused loop. Threshold 0.3 is non-vacuous on the testdata (990 pairs at
    // sf0.01; round 1's 0.8 matched an empty set and verified nothing).
    sqlChecked(
      "dd_embedding_cosine",
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |       FROM embeddings WHERE $ExactVecsGateSql),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM v),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))
        |      / (a.nrm * b.nrm), 6) AS cos
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.3 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = exactPairsVecs(s, Tables.embeddings(s, dir), embeddingsCount(s, dir))
        .select($"vec_id", Exprs.vecAsDouble($"embedding").as("v"))
        .withColumn("nrm", Exprs.l2norm($"v"))
      // the stream side of the broadcast-nested-loop pair scan is widened
      // to every core (r17, the knnEdgesBetween "wide" discipline): the
      // embeddings table is a single small parquet file, so the scan is
      // 1-2 input splits and the O(n²) dot loop was running near-serial
      // on a 32-core box
      // broadcast pin on the b side (ADVICE r17): the widening relies on
      // the UN-repartitioned side being the BNLJ build side; nothing else
      // pins that choice, and a stats shift could silently flip the build
      // side and re-serialize the pair scan onto 1-2 splits
      e.repartition(s.sparkContext.defaultParallelism).as("a")
        .join(broadcast(e.as("b")), $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id".as("id_a"), $"b.vec_id".as("id_b"),
          round(Exprs.dot($"a.v", $"b.v") / ($"a.nrm" * $"b.nrm"), 6).as("cos"))
        .filter($"cos" >= 0.3)
        .transform(d => QueryDef.largeSort(d, $"id_a", $"id_b"))
    },

    // Winnowing fingerprints (Schleimer et al., SIGMOD'03): the rolling-hash
    // document fingerprinting scheme — hash every 3-gram shingle, slide a
    // w=4 window over the hash stream, keep each window's MINIMUM. Guarantees
    // any shared run of ≥ w+2 tokens between two documents yields a shared
    // fingerprint, with ~2/(w+1) of positions selected. Scale: per-doc
    // expression work + one window partitioned by doc_id; the output is a
    // small fingerprint set per doc (the join key for copy detection —
    // shuffle fingerprints, never text). Oracle-checked via the portable
    // hash; the winnowing guarantee (planted overlap shares fingerprints,
    // disjoint docs share none) is additionally pinned by WinnowingSpec.
    sqlChecked("dd_winnow", winnowOracle(w = 4)) { (s, dir) =>
      import s.implicits._
      winnowFingerprints(s, Tables.documents(s, dir))
        .transform(d => QueryDef.largeSort(d, $"doc_id", $"fp"))
    },

    // Embedding near-dup, LSH scale path: candidate pairs via bucket
    // equality in any of L hyperplane tables (HyperplaneLsh), exact cosine
    // verification on candidates only. Work is O(n·L + candidate pairs) —
    // never all-pairs — so the plan survives a 100× scale-up where
    // dd_embedding_cosine (the labeled exact baseline above) cannot.
    //
    // OUTPUT CONTRACT (ADVICE r06): the result is "pairs with cos ≥ 0.3
    // AMONG b=10/L=24 LSH candidates", NOT "all pairs with cos ≥ 0.3".
    // Precision is 1.0 by construction (exact verify); recall is a function
    // of cosine: ≥ 0.9 in the near-dup regime cos ≥ 0.85 (pinned by
    // LshRecallSpec on a clustered fixture), dropping to ~13% bucket-
    // collision probability for pairs in [0.3, 0.85) — by DESIGN, since
    // sub-0.85 cosines are not near-duplicates and recalling them would
    // cost the candidate blow-up the r05 b=4 setting suffered (79% random
    // collision). The 0.3 verify floor is kept only so the oracle row stays
    // non-vacuous on random testdata (at 0.85 the sf0.01 result set is
    // empty and verifies nothing); the oracle runs the SAME bucket
    // pipeline, so the row checks cross-engine semantics of this contract,
    // not all-pairs completeness — dd_embedding_cosine above is the
    // completeness baseline. The md5-derived planes make the WHOLE
    // pipeline — planes, buckets, candidate join, verification —
    // independently reproducible by the DuckDB oracle.
    sqlChecked(
      "dd_embedding_lsh",
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM v),
         |${HyperplaneLsh.bucketSqlCtes(HyperplaneLsh.DedupTables, HyperplaneLsh.DedupPlanes)},
         |cands AS (
         |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         |  FROM bucketed x JOIN bucketed y
         |    ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
         |SELECT id_a, id_b,
         |  round(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))
         |    / (a.nrm * b.nrm), 6) AS cos
         |FROM cands JOIN n a ON id_a = a.vec_id
         |           JOIN n b ON id_b = b.vec_id
         |WHERE round(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))
         |    / (a.nrm * b.nrm), 6) >= 0.3
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.embeddings(s, dir)
        .select($"vec_id", Exprs.vecAsDouble($"embedding").as("v"))
      QueryDef.largeSort(embeddingLshPairs(s, e, threshold = 0.3), $"id_a", $"id_b")
    },

    // Connected components over the MinHash near-dup graph — pair detection
    // → duplicate GROUPS (component id = min member, i.e. the canonical
    // keeper). Spark runs min-label propagation; the oracle computes the
    // same components by a structurally different algorithm (recursive-CTE
    // transitive closure), so agreement checks the semantics, not the
    // implementation.
    sqlChecked(
      "dd_components",
      componentsOracle(k = 32, bands = 8, threshold = 0.5)) { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir).select($"doc_id")
      val pairs = minhashLshPairs(s, Tables.documents(s, dir))
        .select($"doc_a", $"doc_b")
      componentsOf(s, docs, pairs).orderBy($"doc_id")
    },

    // Duplicate-cluster REPRESENTATIVE selection — the dedup END PRODUCT:
    // components give the duplicate groups; the keeper per group is the
    // highest-QUALITY member (ta_quality score, tie → min doc_id), not just
    // the min id — what a curation pipeline actually writes out. Composes
    // three verified operators (minhash pairs → components → quality) and
    // the oracle recomposes them independently (recursive-CTE closure +
    // the quality CTE + a rank window). Scale: everything upstream is the
    // already-bounded pair/label machinery; the argmax is one window keyed
    // on component — a single shuffle of (doc_id, component, quality).
    sqlChecked(
      "dd_keep_best",
      s"""WITH RECURSIVE ${minhashPairsCtes(k = 32, bands = 8, threshold = 0.5)},
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
         |  UNION SELECT doc_b, doc_a FROM mh_pairs),
         |reach AS (
         |  SELECT doc_id, doc_id AS r FROM documents
         |  UNION
         |  SELECT reach.doc_id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         |comp AS (
         |  SELECT doc_id, min(r) AS component FROM reach GROUP BY doc_id),
         |q AS (
         |  SELECT doc_id,
         |    round(0.4 * (1.0 - punct_ratio) + 0.3 * stop_ratio
         |          + 0.3 * least(1.0, n_tokens / 100.0), 6) AS quality
         |  FROM (
         |    SELECT doc_id, CAST(len(qw) AS BIGINT) AS n_tokens,
         |      CASE WHEN length(text) = 0 THEN 0.0
         |           ELSE round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))
         |                      / CAST(length(text) AS DOUBLE), 6) END AS punct_ratio,
         |      CASE WHEN len(qw) = 0 THEN 0.0
         |           ELSE round(len(list_filter(qw, x -> x IN ('the','a','and','of','to','in','is','it')))
         |                      / CAST(len(qw) AS DOUBLE), 6) END AS stop_ratio
         |    FROM (SELECT doc_id, text,
         |            list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')), '\\s+'),
         |                        x -> x <> '') AS qw
         |          FROM documents))),
         |ranked AS (
         |  SELECT c.doc_id, c.component, q.quality,
         |    row_number() OVER (PARTITION BY c.component
         |                       ORDER BY q.quality DESC, c.doc_id) AS rn,
         |    count(*) OVER (PARTITION BY c.component) AS n_members
         |  FROM comp c JOIN q USING (doc_id))
         |SELECT component, doc_id AS keep_id, n_members, quality AS best_quality
         |FROM ranked WHERE rn = 1 ORDER BY component""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir).select($"doc_id")
      val pairs = minhashLshPairs(s, Tables.documents(s, dir))
        .select($"doc_a", $"doc_b")
      val comps = componentsOf(s, docs, pairs)
      // runtime cross-object reuse (same byName pattern as ta_pipeline_e2e;
      // lazy, so no object-init cycle)
      val quality = TextAnalysis.defs.find(_.name == "ta_quality").get
        .fn(s, dir).select($"doc_id", $"quality")
      val w = Window.partitionBy($"component").orderBy($"quality".desc, $"doc_id".asc)
      comps.join(quality, "doc_id")
        .withColumn("rn", row_number().over(w))
        .withColumn("n_members", count(lit(1)).over(Window.partitionBy($"component")))
        .filter($"rn" === 1)
        .select($"component", $"doc_id".as("keep_id"), $"n_members",
          $"quality".as("best_quality"))
        .transform(d => QueryDef.largeSort(d, $"component"))
    },

    // Fuzzy record linkage (edit-distance entity dedup) over the part
    // catalog: distinct names, BLOCKED on the trailing noun so the
    // quadratic levenshtein comparison runs inside small blocks
    // (Σ block² pairs, never all-pairs — the same shape every record-linkage
    // system uses at scale), then exact edit distance ≤ 2 on block-mates.
    sqlChecked(
      "dd_fuzzy_names",
      """WITH names AS (
        |  SELECT DISTINCT p_name, regexp_extract(p_name, '([a-z]+)$', 1) AS blk
        |  FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val names = Tables.part(s, dir)
        .select($"p_name").distinct()
        .withColumn("blk", regexp_extract($"p_name", "([a-z]+)$", 1))
      names.as("a")
        .join(names.as("b"), $"a.blk" === $"b.blk" && $"a.p_name" < $"b.p_name")
        .select($"a.p_name".as("name_a"), $"b.p_name".as("name_b"),
          levenshtein($"a.p_name", $"b.p_name").cast("long").as("dist"))
        .filter($"dist" <= 2)
        .orderBy($"name_a", $"name_b")
    },

    // Span-level duplication scoring (the exact-substring-dedup family of
    // RefinedWeb/CCNet adapted to span granularity): a doc's word 8-grams
    // are checked against their corpus-wide DOCUMENT FREQUENCY; grams shared
    // with ≥1 other doc are boilerplate/duplication signal, and docs past
    // 50% duplicated grams are dropped. Scale: only 16-byte md5 gram keys
    // shuffle (never text); df rollup and per-doc rollup are both partial-
    // aggregated; keep-decision is integer arithmetic (no float compare).
    sqlChecked(
      "dd_span_dup",
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g')), '\s+'),
        |                w -> w <> '') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(generate_series(1, len(w)-7),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
        |             w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7])) AS shingle
        |    FROM toks WHERE len(w) >= 8)),
        |freq AS (SELECT shingle, count(*) AS docs FROM sh GROUP BY shingle),
        |per AS (
        |  SELECT sh.doc_id, count(*) AS n_grams,
        |    CAST(sum(CASE WHEN freq.docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        |  FROM sh JOIN freq USING (shingle) GROUP BY sh.doc_id)
        |SELECT d.doc_id,
        |  coalesce(n_grams, 0) AS n_grams, coalesce(n_dup, 0) AS n_dup,
        |  CASE WHEN coalesce(n_grams, 0) = 0 THEN 0.0
        |       ELSE round(coalesce(n_dup, 0) / CAST(n_grams AS DOUBLE), 6) END AS dup_ratio,
        |  (coalesce(n_grams, 0) = 0 OR coalesce(n_dup, 0) * 2 < n_grams) AS keep
        |FROM documents d LEFT JOIN per USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // document frequency via count-over-window on the gram key: ONE
      // exchange on g and one scan of the gram set (a groupBy+join-back
      // formulation computes the exploded grams twice — column pruning
      // makes the two subtrees differ, so ReuseExchange can't kick in)
      val wdf = org.apache.spark.sql.expressions.Window.partitionBy($"g")
      val per = docShinglesOf(s, Tables.documents(s, dir), 8)
        .select($"doc_id", md5($"shingle").as("g"))
        .withColumn("docs", count(lit(1)).over(wdf))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when($"docs" >= 2, 1L).otherwise(0L)).as("n_dup"))
      Tables.documents(s, dir).select($"doc_id")
        .join(per, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_grams", lit(0L)).as("n_grams"),
          coalesce($"n_dup", lit(0L)).as("n_dup"))
        .withColumn("dup_ratio",
          when($"n_grams" === 0, 0.0)
            .otherwise(round($"n_dup".cast("double") / $"n_grams".cast("double"), 6)))
        .withColumn("keep", $"n_grams" === 0 || $"n_dup" * 2 < $"n_grams")
        .transform(d => QueryDef.largeSort(d, $"doc_id"))
    },

    // Corpus-level exact LINE dedup (the C4 §2.1 / RefinedWeb line-level
    // step: boilerplate — nav bars, cookie banners, license headers —
    // repeats VERBATIM across pages; keep each distinct line's FIRST
    // occurrence in corpus order (doc_id, pos), drop every later copy, and
    // report the cleaned document fingerprint). Lines under 16 trimmed
    // chars are exempt — short headers ("Introduction") are legitimate
    // repeats, same spirit as the span-dup 8-gram floor. Scale: the
    // first-occurrence window shuffles (md5, doc_id, pos) — a 16-byte key
    // per line, never the text twice (text rides only the doc_id-keyed
    // reconstruction aggregate, co-partitioned with the source); both
    // shuffle keys are per-line/per-doc, no corpus-wide state.
    sqlChecked(
      "dd_line_dedup",
      """WITH lines AS (
        |  SELECT doc_id, unnest(generate_series(1, len(ls))) - 1 AS pos, unnest(ls) AS l
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents)),
        |marked AS (
        |  SELECT doc_id, pos, l,
        |    (length(trim(l)) < 16 OR
        |     row_number() OVER (PARTITION BY md5(l) ORDER BY doc_id, pos) = 1) AS keep
        |  FROM lines)
        |SELECT doc_id, COUNT(*) AS n_lines,
        |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
        |  md5(COALESCE(string_agg(l, chr(10) ORDER BY pos) FILTER (WHERE keep), '')) AS kept_fp
        |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val lines = Tables.documents(s, dir)
        .select($"doc_id", posexplode(split($"text", "\n")).as(Seq("pos", "l")))
      // Within one md5 partition every row has the same text, hence the same
      // eligibility — the short-line exemption can't shift an eligible
      // line's rank.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5($"l")).orderBy($"doc_id", $"pos")
      val marked = lines.withColumn("keep",
        length(trim($"l")) < 16 || row_number().over(w) === 1)
      marked.groupBy($"doc_id")
        .agg(
          count(lit(1)).as("n_lines"),
          sum(when($"keep", 0L).otherwise(1L)).as("n_dropped"),
          md5(concat_ws("\n",
            transform(
              filter(array_sort(collect_list(struct($"pos", $"l", $"keep"))),
                x => x("keep")),
              x => x("l")))).as("kept_fp"))
        .transform(d => QueryDef.largeSort(d, $"doc_id"))
    },

    // Exact-substring duplicate-span REMOVAL (the end product Lee et al.
    // 2022's ExactSubstr computes with a suffix array; the Spark-native
    // equivalent hashes every W-token sliding window): a window occurrence
    // that is not the globally first occurrence of its hash (first = min
    // (doc_id, pos) — the dd_line_dedup keep-first discipline) marks its W
    // token positions for removal; the doc is reconstructed from the
    // surviving tokens. Complements dd_span_dup (which SCORES docs by
    // duplicated-gram fraction but removes nothing). Scale: strictly
    // linear, unlike any pair-emitting generator — window hashing is
    // in-stage per row, the keep-first window shuffles (hash, doc, pos)
    // 16-byte keys once, coverage explode is ≤ W × duplicate OCCURRENCES
    // (not corpus), and reconstruction shuffles doc-keyed tokens once. The
    // suffix array's arbitrary-length matches degrade to "any shared span
    // ≥ W tokens is caught, boundaries quantized to the window" — the
    // standard trade for a distributed setting.
    sqlChecked(
      "dd_substr_dedup",
      s"""WITH $ToksCte,
         |win AS (
         |  SELECT doc_id, i AS pos,
         |    md5(array_to_string(list_slice(w, i, i + ${SubstrWindow - 1}), ' ')) AS h
         |  FROM toks, unnest(generate_series(1, len(w) - ${SubstrWindow - 1})) AS u(i)
         |  WHERE len(w) >= $SubstrWindow),
         |dup AS (
         |  SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos,
         |      row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
         |    FROM win)
         |  WHERE rn > 1),
         |cov AS (
         |  SELECT DISTINCT doc_id, pos + j AS tpos
         |  FROM dup, unnest(generate_series(0, ${SubstrWindow - 1})) AS v(j)),
         |tok AS (
         |  SELECT doc_id, i AS tpos, w[i] AS tk
         |  FROM toks, unnest(generate_series(1, len(w))) AS u(i)),
         |k AS (
         |  SELECT t.doc_id, t.tpos, t.tk, c.tpos IS NULL AS keep
         |  FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.tpos = c.tpos),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |    sum(CASE WHEN keep THEN 0 ELSE 1 END) AS n_removed,
         |    md5(coalesce(string_agg(tk, ' ' ORDER BY tpos) FILTER (keep), '')) AS kept_fp
         |  FROM k GROUP BY doc_id)
         |SELECT t.doc_id,
         |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
         |  coalesce(a.kept_fp, md5('')) AS kept_fp
         |FROM toks t LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      substrDedup(Tables.documents(s, dir))
        .transform(d => QueryDef.largeSort(d, $"doc_id"))
    },

    // The DEDUP CASCADE — the staged production topology (FineWeb/CCNet/
    // RefinedWeb all run dedup as a cost-ordered pipeline, not one
    // operator): stage 1 exact content-hash (cheapest, catches byte
    // copies), stage 2 canonical-URL (catches re-crawls of one page with
    // different bytes), stage 3 MinHash-LSH + exact-Jaccard verify over
    // the SURVIVORS only (the expensive near-dup pass runs on the
    // already-thinned corpus — the whole point of the ordering). Every
    // doc gets an ATTRIBUTION: which stage removed it and which kept doc
    // it duplicates (dup_of = the smallest qualifying partner, each
    // stage's keep-min convention), or 'keep'. Stage independence makes
    // the restriction sound: a minhash band signature is per-doc, so the
    // pair set over survivors equals the full-corpus pair set restricted
    // to survivor×survivor — which is exactly how the oracle replays it.
    //
    // Scale: stage 1 is one hash-keyed window, stage 2 one url-keyed
    // window (16-byte keys — text never shuffles past stage 1's hash),
    // stage 3 is dd_minhash_lsh's banded plan on the reduced corpus;
    // attribution adds one doc_id-keyed anti-join. Linear end to end.
    sqlChecked(
      "dd_cascade",
      s"""WITH ${minhashPairsCtes(k = 32, bands = 8, threshold = 0.5)},
         |s1 AS (
         |  SELECT doc_id, source,
         |    min(doc_id) OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS s1_keep
         |  FROM documents),
         |exact_dups AS (
         |  SELECT doc_id, 'exact' AS stage, s1_keep AS dup_of
         |  FROM s1 WHERE doc_id <> s1_keep),
         |surv1 AS (SELECT doc_id, source FROM s1 WHERE doc_id = s1_keep),
         |u AS (SELECT doc_id, ${UrlCuration.dirtyUrlSql} AS url FROM surv1),
         |cu AS (SELECT doc_id, ${UrlCuration.canonUrlSql} AS canon_url FROM u),
         |s2 AS (
         |  SELECT doc_id, min(doc_id) OVER (PARTITION BY canon_url) AS s2_keep
         |  FROM cu),
         |url_dups AS (
         |  SELECT doc_id, 'url' AS stage, s2_keep AS dup_of
         |  FROM s2 WHERE doc_id <> s2_keep),
         |surv2 AS (SELECT doc_id FROM s2 WHERE doc_id = s2_keep),
         |near AS (
         |  SELECT p.doc_b AS doc_id, 'near' AS stage, min(p.doc_a) AS dup_of
         |  FROM mh_pairs p
         |  JOIN surv2 sa ON p.doc_a = sa.doc_id
         |  JOIN surv2 sb ON p.doc_b = sb.doc_id
         |  GROUP BY p.doc_b),
         |keeps AS (
         |  SELECT doc_id, 'keep' AS stage, CAST(NULL AS BIGINT) AS dup_of
         |  FROM surv2 WHERE doc_id NOT IN (SELECT doc_id FROM near))
         |SELECT doc_id, stage, dup_of FROM exact_dups
         |UNION ALL SELECT doc_id, stage, dup_of FROM url_dups
         |UNION ALL SELECT doc_id, stage, dup_of FROM near
         |UNION ALL SELECT doc_id, stage, dup_of FROM keeps
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      QueryDef.largeSort(
        cascadeAttribution(s, Tables.documents(s, dir)), $"doc_id")
    }
  )

  /** Core of dd_cascade over any (doc_id, source, text) frame — exposed so
    * PipelineHeadline can run the staged dedup on the gate-surviving slice
    * of the corpus (the composed-pipeline topology) and specs can plant
    * corpora. See the dd_cascade comment for stage semantics.
    */
  def cascadeAttribution(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // s1/s2 are read by every downstream stage AND by several arms of the
    // final union (exact dups, url dups, the LSH near stage's corpus, the
    // keeps anti-join) — cached (r18), each arm previously re-evaluated
    // the full-text md5 fingerprint + window subtree per reference
    val s1 = docs
      .select($"doc_id", $"source", $"text",
        Exprs.fingerprint($"text").as("content_hash"))
      .withColumn("s1_keep",
        min($"doc_id").over(Window.partitionBy($"content_hash")))
      .cache()
    val exactDups = s1.filter($"doc_id" =!= $"s1_keep")
      .select($"doc_id", lit("exact").as("stage"), $"s1_keep".as("dup_of"))
    val surv1 = s1.filter($"doc_id" === $"s1_keep")
    val s2 = surv1
      .select($"doc_id", $"text",
        UrlCuration.canonUrl(
          UrlCuration.dirtyUrl($"source", $"doc_id")).as("canon_url"))
      .withColumn("s2_keep",
        min($"doc_id").over(Window.partitionBy($"canon_url")))
      .cache()
    val urlDups = s2.filter($"doc_id" =!= $"s2_keep")
      .select($"doc_id", lit("url").as("stage"), $"s2_keep".as("dup_of"))
    val surv2 = s2.filter($"doc_id" === $"s2_keep").select($"doc_id", $"text")
    val nearDups = minhashLshPairs(s, surv2)
      .groupBy($"doc_b".as("doc_id"))
      .agg(min($"doc_a").as("dup_of"))
      .select($"doc_id", lit("near").as("stage"), $"dup_of")
    val keeps = surv2.select($"doc_id")
      .join(nearDups.select($"doc_id"), Seq("doc_id"), "left_anti")
      .select($"doc_id", lit("keep").as("stage"),
        lit(null).cast("long").as("dup_of"))
    exactDups.union(urlDups).union(nearDups).union(keeps)
  }

  /** Core of dd_substr_dedup over any (doc_id, text) frame — exposed so the
    * planted-case spec can drive it on adversarial inputs.
    */
  def substrDedup(docs0: DataFrame): DataFrame = {
    val W = SubstrWindow
    val docs = docs0.select(col("doc_id"), Exprs.normWords(col("text")).as("w"))
    // window hashes computed IN-STAGE per row (no shuffle): (pos, h) pairs
    val wins = docs.filter(size(col("w")) >= W)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("w")) - (W - 1)),
        i => struct(i.as("pos"),
          md5(concat_ws(" ", slice(col("w"), i, lit(W)))).as("h")))).as("pw"))
      .select(col("doc_id"), col("pw.pos").as("pos"), col("pw.h").as("h"))
    // keep-first: one window per hash, 16-byte shuffle keys
    val byH = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("doc_id"), col("pos"))
    val dup = wins.withColumn("rn", row_number().over(byH))
      .filter(col("rn") > 1).select(col("doc_id"), col("pos"))
    // covered token positions: ≤ W × duplicate occurrences rows
    val cov = dup
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (W - 1))).as("tpos"))
      .distinct()
    val tok = docs
      .select(col("doc_id"), posexplode(col("w")).as(Seq("i", "tk")))
      .select(col("doc_id"), (col("i") + 1).as("tpos"), col("tk"))
    val k = tok
      .join(cov.withColumn("hit", lit(true)), Seq("doc_id", "tpos"), "left")
      .select(col("doc_id"), col("tpos"), col("tk"), col("hit").isNotNull.as("rm"))
    val agg = k.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_tokens"),
      sum(when(col("rm"), 1L).otherwise(0L)).as("n_removed"),
      md5(concat_ws(" ",
        transform(
          filter(array_sort(collect_list(struct(col("tpos"), col("tk"), col("rm")))),
            x => !x("rm")),
          x => x("tk")))).as("kept_fp"))
    docs.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("kept_fp"), md5(lit(""))).as("kept_fp"))
  }
}
