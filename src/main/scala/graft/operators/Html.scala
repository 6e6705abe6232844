package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction: the front of a crawl-derived training-data
  * pipeline (Common-Crawl-style corpora arrive as markup; every
  * downstream operator here — dedup, quality, tokenization — wants
  * clean text). Extraction is a fixed chain of regex strips in the
  * trafilatura/jusText spirit, deliberately expressed as pure
  * `functions._` regexp chains: codegen'd, embarrassingly parallel,
  * zero shuffles — the payload column never leaves the scan stage.
  * The regex subset is chosen to evaluate identically on Java regex
  * and RE2 (no lookaround, inline (?s) only), so the whole pipeline
  * is oracle-replayable.
  *
  * Emitted signals: `title`, cleaned `body`, `n_links`,
  * `link_density` (anchor-text chars / body chars — jusText's
  * boilerplate discriminator: nav/footer blocks are link-dense,
  * content is not).
  *
  * Not a browser: no entity table beyond the common six, no script
  * evaluation, no malformed-tag recovery beyond non-greedy block
  * strips — the documented contract for a bulk corpus pass, where
  * pathological pages should be quarantined upstream
  * ([[graft.sources.Sources]]), not repaired here.
  */
object Html {

  private val BlockStrip =
    "(?s)<(script|style)[^>]*>.*?</(script|style)>"
  private val CommentStrip = "(?s)<!--.*?-->"
  private val TagStrip = "<[^>]*>"

  /** Decode the six ubiquitous entities; `&amp;` LAST so escaped
    * entity text (`&amp;lt;`) decodes one level, not two. */
  private def decodeEntities(c: Column): Column = {
    val pre = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ")
    val decoded = pre.foldLeft(c) { case (acc, (e, v)) =>
      replace(acc, lit(e), lit(v)) }
    replace(decoded, lit("&amp;"), lit("&"))
  }

  private def collapseWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** The body-cleaning chain on a raw markup column: block strips →
    * comment strip → tag strip (tags become spaces so adjacent text
    * does not fuse) → entity decode → whitespace collapse. */
  private def cleanText(html: Column): Column =
    collapseWs(decodeEntities(regexp_replace(
      regexp_replace(regexp_replace(html, BlockStrip, " "),
        CommentStrip, " "),
      TagStrip, " ")))

  /** Block-level tags considered candidate content units (the
    * jusText paragraph model). `<p ...>` must be a whole tag name —
    * `(?:\s[^>]*)?` keeps `<pre>` from matching as `p` + junk. */
  private val BlockRe =
    "(?s)<(?:p|li|h[1-6])(?:\\s[^>]*)?>(.*?)</(?:p|li|h[1-6])\\s*>"
  private val AnchorRe = "(?s)<a[^>]*>(.*?)</a>"

  /** Block-level boilerplate classification (jusText-lite): split the
    * page into candidate content blocks (<p>, <li>, <h1-6>), score
    * each by length and link density, and keep only content-like
    * blocks. Navigation, link farms, and tag-soup headings drop out
    * here even when page-level extraction would keep them. Blocks are
    * taken from comment/script/style-STRIPPED markup — a `<p>` inside
    * a script string or an HTML comment must not surface as a ghost
    * block (both corners exist in the spec fixtures). A block is
    * content iff it has >= `minWords` words and link_density <= 0.5
    * (compared exactly as 2*link_chars <= n_chars — no float
    * boundary). One codegen expression in the scan stage: zero
    * shuffles, markup never leaves the scan.
    *
    * Output per doc: `n_blocks`, `n_content`, `content_text` (kept
    * blocks, cleaned, joined by one space), `boilerplate_ratio`
    * (dropped block chars / total block chars; 0.0 for a blockless
    * page).
    */
  def mainContent(docs: DataFrame, idCol: String, htmlCol: String,
      minWords: Int = 3): DataFrame = {
    val mc = mainContentCol(col(htmlCol), minWords)
    docs.select(col(idCol).as("doc_id"),
      mc.getField("n_blocks").as("n_blocks"),
      mc.getField("n_content").as("n_content"),
      mc.getField("content_text").as("content_text"),
      mc.getField("boilerplate_ratio").as("boilerplate_ratio"))
  }

  /** [[mainContent]] as a single struct-valued column, for pipelines
    * that must carry other per-record fields (e.g. HTTP status from
    * [[Warc]]) through the same projection. Computed by the codegen
    * expression [[graft.functions.HtmlMainContent]] — the
    * array-lambda chain it replaced ran INTERPRETED per block and
    * made this the #3 most expensive query of the round-9 close;
    * [[mainContentColReference]] keeps that chain as the
    * differential-spec reference. */
  def mainContentCol(html: Column, minWords: Int = 3): Column =
    graft.functions.HtmlMainContent.mainContent(html, minWords)

  /** The declarative array-lambda reference implementation of
    * [[mainContentCol]] — semantically identical by construction
    * (the codegen expression runs the same Java regexes on the same
    * String); retained for the differential spec that enforces it. */
  private[graft] def mainContentColReference(html: Column, minWords: Int = 3): Column = {
    val noHidden = regexp_replace(regexp_replace(html,
      BlockStrip, " "), CommentStrip, " ")
    val recs = transform(regexp_extract_all(noHidden, lit(BlockRe), lit(1)),
      b => {
        val t = cleanText(b)
        val lc = aggregate(
          transform(regexp_extract_all(b, lit(AnchorRe), lit(1)),
            a => length(cleanText(a))),
          lit(0), (acc, x) => acc + x)
        struct(t.as("text"),
          when(t === "", lit(0)).otherwise(size(split(t, " "))).as("n_words"),
          length(t).as("n_chars"), lc.as("link_chars"))
      })
    val content = filter(recs, r =>
      r("n_words") >= minWords && r("link_chars") * 2 <= r("n_chars"))
    val totalChars = aggregate(recs, lit(0), (acc, r) => acc + r("n_chars"))
    val keptChars = aggregate(content, lit(0), (acc, r) => acc + r("n_chars"))
    struct(
      size(recs).cast("long").as("n_blocks"),
      size(content).cast("long").as("n_content"),
      array_join(transform(content, r => r("text")), " ").as("content_text"),
      when(totalChars > 0,
        round((totalChars - keptChars) / totalChars.cast("double"), 6))
        .otherwise(lit(0.0)).as("boilerplate_ratio"))
  }

  /** Cleaned first-<title> text of a raw markup column — exposed at
    * column level so callers composing with other scan-stage parsers
    * (e.g. [[Warc]]) stay a single narrow projection. */
  def titleCol(html: Column): Column =
    cleanText(regexp_extract(html, "(?s)<title>(.*?)</title>", 1))

  /** Cleaned body text: inside <body>…</body>, or the whole document
    * when no body tag exists. */
  def bodyTextCol(html: Column): Column =
    cleanText(when(html.rlike("(?s)<body[^>]*>"),
      regexp_extract(html, "(?s)<body[^>]*>(.*?)</body>", 1))
      .otherwise(html))

  /** Extract per-document: `title` (first <title> block, cleaned),
    * `body` (text inside <body>…</body>, or the whole document when
    * no body tag exists), `n_chars`, `n_links`, `link_density`.
    * NULL markup yields a NULL-fielded row (the doc survives for
    * lineage; quarantine upstream decides its fate). */
  def extract(docs: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val html = col(htmlCol)
    val anchorTexts = regexp_extract_all(html,
      lit("(?s)<a[^>]*>(.*?)</a>"), lit(1))
    val linkChars = aggregate(
      transform(anchorTexts, a => length(cleanText(a))),
      lit(0), (acc, x) => acc + x).cast("long")
    docs.select(col(idCol).as("doc_id"),
        titleCol(html).as("title"),
        bodyTextCol(html).as("body"),
        size(regexp_extract_all(html, lit("<a[\\s>]"), lit(0)))
          .cast("long").as("n_links"),
        linkChars.as("link_chars"))
      .withColumn("n_chars", length(col("body")).cast("long"))
      .withColumn("link_density",
        when(col("n_chars") > 0,
          round(col("link_chars") / col("n_chars"), 6)).otherwise(lit(0.0)))
      .drop("link_chars")
  }
}
