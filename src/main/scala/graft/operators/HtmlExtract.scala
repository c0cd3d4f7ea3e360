package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.QueryDef.sqlChecked

/** HTML → text extraction (boilerplate removal) — the raw-crawl-to-text
  * stage every pretraining corpus starts with (public recipes: jusText's
  * block classification by link density / stopword density [Pomikálek
  * 2011], trafilatura; CCNet §3 and RefinedWeb §3 both presuppose
  * extracted text). The corpus table is already-extracted text, so the
  * query PLANTS deterministic markup derived from (doc_id, text) — the
  * dirtyUrl discipline of [[UrlCuration]] — wrapping the real text in
  * body paragraphs surrounded by exactly the boilerplate this stage
  * exists to drop (nav bars, ad blocks, tag sidebars, footers, titles),
  * and the oracle replays the identical construction + extraction, so
  * the extractor is verified end-to-end on every row. HtmlExtractSpec
  * additionally pins hand-built edge shapes (nav/footer dropped, body
  * kept, inline anchors surviving inside a good block, the all-boiler
  * document extracting to '').
  *
  * The classifier is the jusText CORE rule set — per-block link density,
  * stopword density and a length floor, with long blocks kept
  * unconditionally (length saturation) — without the second
  * neighbor-context pass (jusText's "short/near-good" smoothing), which
  * needs block adjacency state and is documented as the extension point.
  * All thresholds compare in INTEGER arithmetic (2·anchor_len < vis_len,
  * 10·stop_cnt ≥ word_cnt), so both engines decide every block
  * identically — no float-comparison drift.
  *
  * Scale shape: the whole extraction is pure per-row Column expressions —
  * one regexp split into blocks, one transform to (visible text, anchor
  * length) structs, one filter + join back to a string. No UDF, no
  * shuffle, no explode: block features live inside array lambdas, so a
  * 100 TB crawl pays exactly one scan and the final sort is the only
  * exchange (PlanSpec pins that). Memory is bounded by the largest single
  * document, not the block count.
  */
object HtmlExtract {

  /** A block keeps only if its visible text reaches this length. */
  val MinVisChars = 25

  /** Long blocks keep regardless of stopword density (length saturation —
    * jusText's "heuristic.length.high" analog).
    */
  val LongVisChars = 100

  /** The stopword set shared with ta_quality's scoring. */
  val StopEn: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it")

  /** Block-level tag boundary: split points for the block segmentation.
    * Longer tag names precede their prefixes (header before head, html
    * before h1) and a name must be followed by whitespace-attrs or '>',
    * so `<a href=...>` (inline) never splits a block.
    */
  val BlockBoundary: String =
    """(?i)</?(?:html|header|head|title|body|nav|footer|aside|div|p|h1|h2|h3|ul|li)(?:\s[^>]*)?>"""

  // ---- deterministic planted markup from (doc_id, text) ----------------

  /** Spark side: the document's real text split into two body paragraphs
    * (the second with an inline anchor), wrapped in title/nav/h1 chrome
    * plus cycling ad (%3=1), sidebar (%4=2) and footer (%2=0) boilerplate.
    */
  def plantedHtml(docId: Column, text: Column): Column = {
    val half = (length(text) / 2).cast("int")
    val d7 = (docId % 7).cast("string")
    val d9 = (docId % 9).cast("string")
    concat(
      lit("<html><head><title>site s"), d7, lit("</title></head><body>"),
      lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> <a href=\"/cat\">cat c"),
      d7, lit("</a></nav>"),
      lit("<h1>doc "), docId.cast("string"), lit("</h1>"),
      when(docId % 3 === 1,
        lit("<div><a href=\"/buy\">buy now</a> <a href=\"/deal\">sale sale</a></div>"))
        .otherwise(lit("")),
      lit("<p>"), substr(text, lit(1), half), lit("</p>"),
      when(docId % 4 === 2,
        concat(lit("<aside>tags t"), (docId % 5).cast("string"),
          lit(" t"), (docId % 3).cast("string"), lit("</aside>")))
        .otherwise(lit("")),
      lit("<p>"), substr(text, half + 1),
      lit(" see <a href=\"/ref/"), d9, lit("\">ref "), d9, lit("</a></p>"),
      when(docId % 2 === 0,
        lit("<footer><a href=\"/privacy\">privacy</a> <a href=\"/terms\">terms</a> of site</footer>"))
        .otherwise(lit("")),
      lit("</body></html>"))
  }

  /** The identical construction as a DuckDB SQL fragment over doc_id/text. */
  val plantedHtmlSql: String =
    """('<html><head><title>site s' || CAST(doc_id % 7 AS VARCHAR) || '</title></head><body>'
      | || '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/cat">cat c' || CAST(doc_id % 7 AS VARCHAR) || '</a></nav>'
      | || '<h1>doc ' || CAST(doc_id AS VARCHAR) || '</h1>'
      | || (CASE WHEN doc_id % 3 = 1 THEN '<div><a href="/buy">buy now</a> <a href="/deal">sale sale</a></div>' ELSE '' END)
      | || '<p>' || substr(text, 1, length(text) // 2) || '</p>'
      | || (CASE WHEN doc_id % 4 = 2 THEN '<aside>tags t' || CAST(doc_id % 5 AS VARCHAR) || ' t' || CAST(doc_id % 3 AS VARCHAR) || '</aside>' ELSE '' END)
      | || '<p>' || substr(text, length(text) // 2 + 1) || ' see <a href="/ref/' || CAST(doc_id % 9 AS VARCHAR) || '">ref ' || CAST(doc_id % 9 AS VARCHAR) || '</a></p>'
      | || (CASE WHEN doc_id % 2 = 0 THEN '<footer><a href="/privacy">privacy</a> <a href="/terms">terms</a> of site</footer>' ELSE '' END)
      | || '</body></html>')""".stripMargin.replace("\n", " ")

  // ---- the extractor ---------------------------------------------------

  /** Visible text of a raw block fragment: tags become spaces, whitespace
    * collapses, ends trim. Anchor LABELS stay visible (they are text the
    * reader sees) — only the markup vanishes.
    */
  def visibleText(raw: Column): Column =
    trim(regexp_replace(regexp_replace(raw, "<[^>]*>", " "), "\\s+", " "))

  /** Total characters of anchor-label text in a raw block fragment — the
    * numerator of jusText's link density.
    */
  def anchorLen(raw: Column): Column =
    coalesce(
      aggregate(
        transform(
          regexp_extract_all(raw, lit("<a[^>]*>([^<]*)</a>"), lit(1)),
          x => length(x)),
        lit(0), (acc, x) => acc + x),
      lit(0))

  /** Block list of an html column: (vis, alen) structs for every
    * non-empty-visible fragment between block-tag boundaries.
    */
  def blocks(html: Column): Column =
    filter(
      transform(split(html, BlockBoundary),
        raw => struct(visibleText(raw).as("vis"), anchorLen(raw).as("alen"))),
      s => s.getField("vis") =!= "")

  /** The jusText core keep rule in integer arithmetic. */
  def keepBlock(s: Column): Column = {
    val vis = s.getField("vis")
    val words = filter(split(lower(vis), " "), w => w =!= "")
    val stops = filter(words, w => w.isin(StopEn: _*))
    length(vis) >= MinVisChars &&
      s.getField("alen") * 2 < length(vis) &&
      (size(stops) * 10 >= size(words) || length(vis) >= LongVisChars)
  }

  /** Full extraction over an html column: n_blocks, n_kept, kept_chars,
    * extracted (kept visible blocks joined by one space, '' when nothing
    * survives). Exposed for the spec's hand-built documents.
    */
  def extractCols(html: Column): Seq[Column] = {
    val bs = blocks(html)
    val kept = transform(filter(bs, keepBlock _), s => s.getField("vis"))
    val extracted = array_join(kept, " ")
    Seq(
      size(bs).cast("long").as("n_blocks"),
      size(kept).cast("long").as("n_kept"),
      length(extracted).cast("long").as("kept_chars"),
      extracted.as("extracted"))
  }

  /** The identical extraction as DuckDB SQL over an `html` column (NULL
    * array_to_string of an empty kept list coalesces to '' — Spark's
    * array_join semantics).
    */
  val extractSql: String =
    s"""SELECT doc_id, CAST(len(bs) AS BIGINT) AS n_blocks,
       |  CAST(len(kept) AS BIGINT) AS n_kept,
       |  CAST(COALESCE(length(array_to_string(kept, ' ')), 0) AS BIGINT) AS kept_chars,
       |  COALESCE(array_to_string(kept, ' '), '') AS extracted
       |FROM (
       |  SELECT doc_id, bs,
       |    list_transform(
       |      list_filter(bs, s ->
       |        length(s.vis) >= $MinVisChars AND s.alen * 2 < length(s.vis)
       |        AND (10 * len(list_filter(list_filter(string_split(lower(s.vis), ' '), w -> w <> ''),
       |                       w -> w IN (${StopEn.map("'" + _ + "'").mkString(",")})))
       |               >= len(list_filter(string_split(lower(s.vis), ' '), w -> w <> ''))
       |             OR length(s.vis) >= $LongVisChars)),
       |      s -> s.vis) AS kept
       |  FROM (
       |    SELECT doc_id,
       |      list_filter(
       |        list_transform(regexp_split_to_array(html, '$BlockBoundary'),
       |          raw -> struct_pack(
       |            vis := trim(regexp_replace(regexp_replace(raw, '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')),
       |            alen := COALESCE(list_sum(list_transform(
       |              regexp_extract_all(raw, '<a[^>]*>([^<]*)</a>', 1), x -> length(x))), 0))),
       |        s -> s.vis <> '') AS bs
       |    FROM h))""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Per-doc boilerplate removal over the planted markup: block counts,
    // survivor counts and the reassembled text. One scan, zero shuffles
    // below the presentation sort.
    sqlChecked(
      "ta_html_extract",
      s"""WITH h AS (SELECT doc_id, $plantedHtmlSql AS html FROM documents)
         |$extractSql
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", plantedHtml($"doc_id", $"text").as("html"))
        .select(($"doc_id" +: extractCols($"html")): _*)
        .transform(d => graft.QueryDef.largeSort(d, $"doc_id"))
    }
  )
}
