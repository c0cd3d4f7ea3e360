package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.QueryDef.sqlChecked

/** URL/host canonicalization + per-domain budgets — the web-curation stage
  * between raw crawl and dedup (public recipe: CCNet's URL-keyed dedup,
  * RefinedWeb §3's host-level dedup and per-domain caps). The corpus table
  * carries no URL column, so both queries DERIVE a deterministic dirty URL
  * from (source, doc_id) — planted with exactly the mess canonicalization
  * exists for (case-shuffled scheme/host, `WWW.` prefixes, explicit
  * default ports, `utm_*` tracking params, fragments) — and the oracle
  * replays the same construction, so the canonicalizer is verified
  * end-to-end on every row. UrlCanonSpec additionally pins hand-built edge
  * shapes (port 8080 preserved, utm-only query collapses, empty path → /).
  *
  * Scale shape: canonicalization is pure per-row Column expressions
  * (regexp extract/replace + an array filter over query params — all
  * codegen'd, no UDF, no shuffle); at 100 TB it rides whatever scan the
  * pipeline already does. The dedup/cap stage is one shuffle keyed on
  * canonical URL and one window keyed on host — the RefinedWeb shapes.
  * A genuinely hot host (one domain = half the crawl) is the documented
  * skew case, same as ta_source_cap: the cap is a top-K-per-key, so the
  * TopKPerKey bounded-heap operator or cap-then-sample per shard both
  * apply unchanged with host as the key.
  */
object UrlCuration {

  /** Hosts keep at most this many docs (best-first). Small enough to bind
    * at sf0.01 (~7 docs/host), decisively at sf0.1 (~70/host).
    */
  val HostCap = 5

  // ---- deterministic dirty URL from (source, doc_id) -------------------

  /** Spark side. Shapes cycle by doc_id so every mess class appears:
    * doc_id%3 picks host case / WWW. prefix, %4∈{0,1} adds the matching
    * default port, %3 again picks the query (none / utm+id / id+utm),
    * %5=2 adds a fragment.
    */
  def dirtyUrl(source: Column, docId: Column): Column = {
    val hostCore = concat(source, lit("-h"), (docId % 7).cast("string"))
    val baseHost = concat(hostCore, lit(".example.com"))
    val host = when(docId % 3 === 0, upper(baseHost))
      .when(docId % 3 === 1, concat(lit("WWW."), baseHost))
      .otherwise(baseHost)
    val scheme = when(docId % 2 === 0, lit("http")).otherwise(lit("HTTPS"))
    val port = when(docId % 4 === 0, lit(":80"))
      .when(docId % 4 === 1, lit(":443")).otherwise(lit(""))
    val path = concat(lit("/p/"), (docId % 11).cast("string"))
    val query = when(docId % 3 === 1,
        concat(lit("?utm_source=feed&id="), (docId % 13).cast("string")))
      .when(docId % 3 === 2,
        concat(lit("?id="), (docId % 13).cast("string"), lit("&utm_campaign=x")))
      .otherwise(lit(""))
    val frag = when(docId % 5 === 2,
      concat(lit("#sec"), (docId % 4).cast("string"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, port, path, query, frag)
  }

  /** The identical construction as a DuckDB SQL fragment over doc_id/source. */
  val dirtyUrlSql: String =
    """(CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'HTTPS' END || '://'
      | || (CASE WHEN doc_id % 3 = 0 THEN upper(source || '-h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com')
      |          WHEN doc_id % 3 = 1 THEN 'WWW.' || source || '-h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
      |          ELSE source || '-h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' END)
      | || (CASE WHEN doc_id % 4 = 0 THEN ':80' WHEN doc_id % 4 = 1 THEN ':443' ELSE '' END)
      | || '/p/' || CAST(doc_id % 11 AS VARCHAR)
      | || (CASE WHEN doc_id % 3 = 1 THEN '?utm_source=feed&id=' || CAST(doc_id % 13 AS VARCHAR)
      |          WHEN doc_id % 3 = 2 THEN '?id=' || CAST(doc_id % 13 AS VARCHAR) || '&utm_campaign=x'
      |          ELSE '' END)
      | || (CASE WHEN doc_id % 5 = 2 THEN '#sec' || CAST(doc_id % 4 AS VARCHAR) ELSE '' END))"""
      .stripMargin.replace("\n", " ")

  // ---- canonicalization ------------------------------------------------

  /** Canonical host: lowercase, default port stripped (`:80` iff http,
    * `:443` iff https — a real `:8080` survives), leading `www.` dropped.
    */
  def canonHost(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val hostport = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    val noPort = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Canonical URL: lowercase scheme + [[canonHost]], path normalized
    * ('' → '/'), fragment dropped, `utm_*` query params filtered out (the
    * query vanishes entirely when nothing survives). Param ORDER is kept —
    * reordering keys is not semantics-preserving for every site, so it
    * stays out of the canonical form (CCNet keeps order too).
    */
  def canonUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val rest = regexp_extract(url, "^[A-Za-z]+://[^/?#]+(.*)$", 1)
    val path = regexp_replace(rest, "[?#].*$", "")
    val pathC = when(path === "", lit("/")).otherwise(path)
    // The query must come from the PRE-fragment substring: a bare
    // "\\?([^#]*)" matches the first '?' anywhere, so 'http://h/p#f?x=1'
    // would resurrect fragment content as a query string. The non-greedy
    // [^#]*? prefix forces the matched '?' to precede any '#'.
    val query = regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)
    val kept = filter(split(query, "&"),
      p => !startswith(p, lit("utm_")) && p =!= "")
    val queryC = array_join(kept, "&")
    concat(scheme, lit("://"), canonHost(url), pathC,
      when(queryC =!= "", concat(lit("?"), queryC)).otherwise(lit("")))
  }

  /** The same two canonicalizations as DuckDB SQL over a `url` column. */
  val canonHostSql: String =
    """regexp_replace(
      |  CASE WHEN lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) = 'http'
      |         THEN regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)), ':80$', '')
      |       WHEN lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) = 'https'
      |         THEN regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)), ':443$', '')
      |       ELSE lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) END,
      |  '^www\.', '')""".stripMargin.replace("\n", " ")

  val canonUrlSql: String = {
    val queryC =
      """array_to_string(list_filter(string_split(regexp_extract(url, '^[^#]*?\?([^#]*)', 1), '&'),
        | p -> NOT starts_with(p, 'utm_') AND p <> ''), '&')""".stripMargin.replace("\n", " ")
    s"""(lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://' || $canonHostSql
       | || (CASE WHEN regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?#]+(.*)$$', 1), '[?#].*$$', '') = ''
       |          THEN '/'
       |          ELSE regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?#]+(.*)$$', 1), '[?#].*$$', '') END)
       | || (CASE WHEN $queryC <> '' THEN '?' || $queryC ELSE '' END))"""
      .stripMargin.replace("\n", " ")
  }

  /** The planted category blocklist (the UT1/RefinedWeb §3.1 side input,
    * scaled down): entries at BOTH depths — registrable-domain rows that
    * block a whole source and host rows that block one subdomain — plus a
    * more-specific row shadowing a domain row (longest match must win) and
    * a row matching nothing (no false hits). Exposed for BlocklistSpec.
    */
  val Blocklist: Seq[(String, String)] = Seq(
    "src3.example.com" -> "ads",
    "src7.example.com" -> "adult",
    "h2.src11.example.com" -> "gambling",
    "h5.src3.example.com" -> "tracking", // more specific than the src3 row
    "src99.example.com" -> "malware") // matches no host

  private val blocklistValuesSql =
    Blocklist.map { case (e, c) => s"('$e', '$c')" }.mkString(", ")

  val defs: Seq[QueryDef] = Seq(

    // URL-category BLOCKLIST filter (RefinedWeb §3.1 / the UT1 blocklist;
    // CCNet filters by domain the same way): a host is blocked when ANY
    // label-boundary suffix of it (down to the registrable domain, never
    // the bare TLD) appears in the blocklist, and when several entries
    // match, the MOST SPECIFIC (longest suffix = smallest explode pos)
    // decides the category. Hosts here are the post-canonicalization deep
    // form h{doc_id%7}.{source}.example.com — the blocklist consumes
    // ta_url_canon's output in the real pipeline order.
    //
    // Scale shape: the suffix chain is depth-bounded (labels−1 ≤ 3 rows
    // per doc), the blocklist join is a BROADCAST hash join at this size
    // (at the UT1 scale, 4.6M entries, the identical plan hash-partitions
    // on the suffix string instead), the longest-match winner is one
    // doc_id-keyed min(struct) aggregate, and the keep-flag join back to
    // the corpus is doc_id-keyed sort-merge — all linear, no all-pairs.
    sqlChecked(
      "ta_blocklist",
      s"""WITH h AS (
         |  SELECT doc_id,
         |    'h' || CAST(doc_id % 7 AS VARCHAR) || '.' || source || '.example.com' AS host
         |  FROM documents),
         |lab AS (SELECT doc_id, host, string_split(host, '.') AS labels FROM h),
         |ex AS (
         |  SELECT doc_id, host,
         |    unnest(generate_series(1, len(labels) - 1)) - 1 AS pos,
         |    unnest(list_transform(generate_series(1, len(labels) - 1),
         |                          i -> array_to_string(labels[i:len(labels)], '.'))) AS suffix
         |  FROM lab),
         |bl(entry, category) AS (VALUES $blocklistValuesSql),
         |best AS (
         |  SELECT ex.doc_id, min_by(suffix, pos) AS matched_entry,
         |    min_by(bl.category, pos) AS category
         |  FROM ex JOIN bl ON suffix = entry GROUP BY ex.doc_id)
         |SELECT h.doc_id, h.host, best.matched_entry, best.category,
         |  (best.matched_entry IS NOT NULL) AS blocked
         |FROM h LEFT JOIN best ON h.doc_id = best.doc_id
         |ORDER BY h.doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      graft.QueryDef.largeSort(
        blocklistMatches(s, Tables.documents(s, dir)), $"doc_id")
    },

    // Per-doc canonicalization: the dirty URL beside its canonical form and
    // host. Pure per-row expressions — the linear scan is the whole plan.
    sqlChecked(
      "ta_url_canon",
      s"""WITH u AS (SELECT doc_id, $dirtyUrlSql AS url FROM documents)
         |SELECT doc_id, url, $canonUrlSql AS canon_url, $canonHostSql AS host
         |FROM u ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", dirtyUrl($"source", $"doc_id").as("url"))
        .select($"doc_id", $"url", canonUrl($"url").as("canon_url"),
          canonHost($"url").as("host"))
        .transform(d => graft.QueryDef.largeSort(d, $"doc_id"))
    },

    // URL-keyed dedup + per-host budget (RefinedWeb §3): canonical-URL
    // duplicates collapse to the smallest doc_id; the survivors are ranked
    // within their host by (n_chars desc, doc_id) and capped at HostCap.
    // Scale: one shuffle on canon_url (16-byte-hashable key, never text),
    // one window on host; both linear in docs.
    sqlChecked(
      "dd_url_dedup",
      s"""WITH u AS (SELECT doc_id, n_chars, $dirtyUrlSql AS url FROM documents),
         |c AS (SELECT doc_id, n_chars, $canonUrlSql AS canon_url, $canonHostSql AS host FROM u),
         |uniq AS (
         |  SELECT *, row_number() OVER (PARTITION BY canon_url ORDER BY doc_id) AS rk_url
         |  FROM c),
         |ranked AS (
         |  SELECT doc_id, host, canon_url, n_chars,
         |    row_number() OVER (PARTITION BY host ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM uniq WHERE rk_url = 1)
         |SELECT doc_id, host, canon_url, CAST(rk AS BIGINT) AS rk,
         |  (rk <= $HostCap) AS keep
         |FROM ranked ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val c = Tables.documents(s, dir)
        .select($"doc_id", $"n_chars", dirtyUrl($"source", $"doc_id").as("url"))
        .select($"doc_id", $"n_chars", canonUrl($"url").as("canon_url"),
          canonHost($"url").as("host"))
      val wUrl = Window.partitionBy($"canon_url").orderBy($"doc_id".asc)
      val wHost = Window.partitionBy($"host").orderBy($"n_chars".desc, $"doc_id".asc)
      c.withColumn("rk_url", row_number().over(wUrl))
        .filter($"rk_url" === 1)
        .withColumn("rk", row_number().over(wHost).cast("long"))
        .select($"doc_id", $"host", $"canon_url", $"rk", ($"rk" <= HostCap).as("keep"))
        .transform(d => graft.QueryDef.largeSort(d, $"doc_id"))
    })

  /** Core of ta_blocklist over any (doc_id, source) frame — exposed for
    * PipelineHeadline's composed gate stage. Label-boundary suffix
    * matching against the category blocklist (see the ta_blocklist
    * comment; the 1-label-host guard keeps Spark's sequence(1, 0)
    * descending-array edge out of the suffix set).
    */
  def blocklistMatches(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val bl = Blocklist.toDF("entry", "category")
    val h = docs.select($"doc_id",
      concat(lit("h"), ($"doc_id" % 7).cast("string"), lit("."), $"source",
        lit(".example.com")).as("host"))
    val labels = split($"host", "\\.")
    val sufs = when(size(labels) >= 2, transform(sequence(lit(1), size(labels) - 1), i =>
      struct((i - 1).as("pos"),
        array_join(slice(labels, i, size(labels) - i + 1), ".").as("suffix"))))
    val ex = h.select($"doc_id", explode(sufs).as("sf"))
      .select($"doc_id", $"sf.pos".as("pos"), $"sf.suffix".as("suffix"))
    val best = ex.join(broadcast(bl), $"suffix" === $"entry")
      .groupBy($"doc_id")
      .agg(min(struct($"pos", $"suffix", $"category")).as("b"))
      .select($"doc_id", $"b.suffix".as("matched_entry"), $"b.category".as("category"))
    h.join(best, Seq("doc_id"), "left")
      .select($"doc_id", $"host", $"matched_entry", $"category",
        $"matched_entry".isNotNull.as("blocked"))
  }
}
