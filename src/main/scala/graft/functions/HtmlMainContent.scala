package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Block-level boilerplate classification (jusText-lite) as ONE
  * codegen expression: markup in, `(n_blocks, n_content,
  * content_text, boilerplate_ratio)` struct out.
  *
  * Semantics are IDENTICAL to the declarative array-lambda chain in
  * [[graft.operators.Html]] (kept there as the spec-tested reference
  * implementation) and to the DuckDB oracle that replays it: same
  * script/style/comment pre-strip, same block regex, same per-block
  * clean chain (tag strip → six-entity decode with `&amp;` last →
  * whitespace collapse), same integer-exact link-density test
  * (`2*link_chars <= n_chars`), same HALF_UP ratio rounding. The
  * Java regexes are byte-for-byte the reference chain's — Spark's
  * regexp functions run java.util.regex on the same String, so
  * equality is by construction, then enforced by a differential spec
  * and the SQL oracle at two scale factors.
  *
  * Why it exists: Spark evaluates higher-order array lambdas
  * INTERPRETED — per block, the ten-step clean chain walked the
  * expression tree through UTF8String↔String conversions, making
  * q_boilerplate/q_crawl_pipeline the #3/#5 most expensive queries
  * of the round-9 close (~4.5 s for 5k docs vs 0.42 s for the flat
  * q_html_extract chain over the same pages). Here the whole struct
  * is computed in one Java pass with precompiled patterns, inlined
  * into whole-stage codegen in the scan stage — the markup column
  * still never shuffles.
  */
case class HtmlMainContent(child: Expression, minWords: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = HtmlMainContent.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_main_content"

  def compute(s: UTF8String): InternalRow = HtmlMainContent.parse(s, minWords)

  override protected def nullSafeEval(input: Any): Any =
    HtmlMainContent.parse(input.asInstanceOf[UTF8String], minWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("htmlMc", this, classOf[HtmlMainContent].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlMainContent =
    copy(child = newChild)
}

object HtmlMainContent {
  val schema: StructType = StructType(Seq(
    StructField("n_blocks", LongType, nullable = false),
    StructField("n_content", LongType, nullable = false),
    StructField("content_text", StringType, nullable = false),
    StructField("boilerplate_ratio", DoubleType, nullable = false)))

  /** Column wrapper: raw markup → mainContent struct. */
  def mainContent(html: Column, minWords: Int): Column =
    GraftColumnBridge.column(
      HtmlMainContent(GraftColumnBridge.expression(html), minWords))

  // The reference chain's regexes, verbatim (operators/Html.scala).
  private val BlockStrip =
    Pattern.compile("(?s)<(script|style)[^>]*>.*?</(script|style)>")
  private val CommentStrip = Pattern.compile("(?s)<!--.*?-->")
  private val TagStrip = Pattern.compile("<[^>]*>")
  private val Ws = Pattern.compile("\\s+")
  private val BlockRe = Pattern.compile(
    "(?s)<(?:p|li|h[1-6])(?:\\s[^>]*)?>(.*?)</(?:p|li|h[1-6])\\s*>")
  private val AnchorRe = Pattern.compile("(?s)<a[^>]*>(.*?)</a>")

  /** operators.Html.cleanText, one String pass: block strips →
    * comment strip → tag strip → entity decode (&amp; LAST, so
    * escaped entities decode one level) → \s+ collapse → space trim
    * (Spark's trim removes ' ' only; after collapse that is the only
    * boundary whitespace). */
  private def cleanText(b: String): String = {
    var x = BlockStrip.matcher(b).replaceAll(" ")
    x = CommentStrip.matcher(x).replaceAll(" ")
    x = TagStrip.matcher(x).replaceAll(" ")
    x = x.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")
    x = Ws.matcher(x).replaceAll(" ")
    var from = 0
    var until = x.length
    while (from < until && x.charAt(from) == ' ') from += 1
    while (until > from && x.charAt(until - 1) == ' ') until -= 1
    x.substring(from, until)
  }

  /** length() on StringType counts code points (UTF8String.numChars),
    * not UTF-16 units — supplementary chars (emoji) must agree. */
  @inline private def nChars(s: String): Int = s.codePointCount(0, s.length)

  def parse(u: UTF8String, minWords: Int): InternalRow = {
    if (u == null) return null
    val html = u.toString
    val noHidden = CommentStrip.matcher(
      BlockStrip.matcher(html).replaceAll(" ")).replaceAll(" ")
    val m = BlockRe.matcher(noHidden)
    var nBlocks = 0L
    var nContent = 0L
    var totalChars = 0
    var keptChars = 0
    val kept = new java.lang.StringBuilder
    while (m.find()) {
      val b = m.group(1)
      val t = cleanText(b)
      val tChars = nChars(t)
      // collapsed+trimmed text: words = spaces + 1 (split(t, " ") shape)
      val words = if (t.isEmpty) 0 else {
        var n = 1; var i = 0
        while (i < t.length) { if (t.charAt(i) == ' ') n += 1; i += 1 }
        n
      }
      var linkChars = 0
      val am = AnchorRe.matcher(b)
      while (am.find()) linkChars += nChars(cleanText(am.group(1)))
      nBlocks += 1
      totalChars += tChars
      if (words >= minWords && linkChars * 2 <= tChars) {
        if (nContent > 0) kept.append(' ') // array_join: separator between ALL elements
        kept.append(t)
        nContent += 1
        keptChars += tChars
      }
    }
    val ratio =
      if (totalChars > 0)
        java.math.BigDecimal.valueOf(
          (totalChars - keptChars) / totalChars.toDouble)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      else 0.0
    InternalRow(nBlocks, nContent, UTF8String.fromString(kept.toString), ratio)
  }
}
