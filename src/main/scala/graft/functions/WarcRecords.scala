package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC (ISO 28500) record splitter over a BINARY column: one web
  * crawl segment in, an array of parsed records out — the front door
  * through which 100 TB text corpora actually arrive (Common-Crawl
  * style WARC files), upstream even of HTML extraction
  * ([[graft.operators.Html]]).
  *
  * Framing honors `Content-Length` — records are sliced by the
  * declared byte count, NOT by searching for the next "WARC/1.0"
  * line, so a crawled page whose BODY embeds a WARC version line (or
  * any other marker) cannot desynchronize the walk. This is the same
  * reason the public warcio/jwarc readers are length-framed; a
  * regex/split implementation is wrong on adversarial-but-legal
  * input and was deliberately rejected here.
  *
  * Per record: the WARC header block (CRLF lines, case-insensitive
  * names per spec) yields `warc_type`, `target_uri`, `warc_date`;
  * `response` records carrying an HTTP payload are further split at
  * the first CRLFCRLF into status line + headers (→ `status`,
  * `content_type`) and the entity `body`; other record types carry
  * their whole block as `body` with the WARC-level Content-Type.
  *
  * Scale contract: runs as a codegen expression in the scan stage —
  * segments are parsed where they are read and the raw payload never
  * shuffles; only the (much smaller) extracted text moves on. One
  * input cell is parsed in one task, so the source layer should feed
  * WARC files at their native ~1 GB granularity (binaryFile source),
  * not concatenations — documented, matching how crawl archives are
  * shipped.
  *
  * Malformed input: a segment whose FIRST record has no WARC/1.x
  * signature is NULL (the quarantine split, as in
  * [[graft.functions.ImageMeta]]); a walk that desyncs mid-segment
  * (bad signature, missing/invalid Content-Length, truncated
  * payload) keeps the records parsed so far and stops — the bulk
  * contract: salvage the prefix, never throw.
  */
case class WarcRecords(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(WarcRecords.recordSchema, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_records"

  def compute(bytes: Array[Byte]): GenericArrayData = WarcRecords.parse(bytes)

  override protected def nullSafeEval(input: Any): Any =
    WarcRecords.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("warcParser", this, classOf[WarcRecords].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
}

object WarcRecords {
  val recordSchema: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("status", IntegerType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("body", StringType, nullable = false)))

  /** Column wrapper: binary WARC segment → array of record structs. */
  def warcRecords(segment: Column): Column =
    GraftColumnBridge.column(WarcRecords(GraftColumnBridge.expression(segment)))

  private val CR = '\r'.toByte
  private val LF = '\n'.toByte

  /** Index just past the next CRLF at/after `from`, or -1. */
  private def lineEnd(b: Array[Byte], from: Int, limit: Int): Int = {
    var i = from
    while (i + 1 < limit) {
      if (b(i) == CR && b(i + 1) == LF) return i
      i += 1
    }
    -1
  }

  private def asciiEqIgnoreCase(b: Array[Byte], from: Int, until: Int,
      name: String): Boolean = {
    if (until - from != name.length) return false
    var i = 0
    while (i < name.length) {
      val c = b(from + i) & 0xFF
      val lc = if (c >= 'A' && c <= 'Z') c + 32 else c
      if (lc != name.charAt(i).toLower.toInt) return false
      i += 1
    }
    true
  }

  private def str(b: Array[Byte], from: Int, until: Int): UTF8String =
    UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, from, until))

  /** Trimmed-ASCII-space view bounds: returns (from', until'). */
  @inline private def trimBounds(b: Array[Byte], from0: Int, until0: Int): (Int, Int) = {
    var from = from0; var until = until0
    while (from < until && (b(from) == ' '.toByte || b(from) == '\t'.toByte)) from += 1
    while (until > from && (b(until - 1) == ' '.toByte || b(until - 1) == '\t'.toByte)) until -= 1
    (from, until)
  }

  /** Parse one CRLF-terminated header block in [from, blockEnd):
    * fills `out` with values for the (lowercased) names in `names`.
    * Returns false on a line with no colon (malformed block). */
  private def parseHeaders(b: Array[Byte], from: Int, blockEnd: Int,
      names: Array[String], out: Array[UTF8String]): Boolean = {
    var i = from
    while (i < blockEnd) {
      val le = lineEnd(b, i, blockEnd + 2) // CRLF of the last line sits at blockEnd
      val end = if (le < 0 || le > blockEnd) blockEnd else le
      var colon = i
      while (colon < end && b(colon) != ':'.toByte) colon += 1
      if (colon >= end) return false
      val (vf, vu) = trimBounds(b, colon + 1, end)
      var n = 0
      while (n < names.length) {
        if (asciiEqIgnoreCase(b, i, colon, names(n))) out(n) = str(b, vf, vu)
        n += 1
      }
      i = end + 2
    }
    true
  }

  private def parseIntAscii(s: UTF8String): Long = {
    if (s == null) return -1L
    val t = s.toString.trim
    if (t.isEmpty || !t.forall(_.isDigit) || t.length > 18) -1L else t.toLong
  }

  // header-name tables (lowercase match targets)
  private val WarcNames = Array("warc-type", "warc-target-uri", "warc-date",
    "content-length", "content-type")
  private val HttpNames = Array("content-type")

  /** Walk the whole segment; null for a null segment or one whose
    * first record already fails to frame. */
  def parse(b: Array[Byte]): GenericArrayData = {
    if (b == null) return null
    val recs = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    var ok = true
    while (ok && i < b.length) {
      // version line: "WARC/1." digit CRLF
      val ve = lineEnd(b, i, b.length)
      if (ve < 0 || ve - i < 8 ||
          !(b(i) == 'W' && b(i + 1) == 'A' && b(i + 2) == 'R' &&
            b(i + 3) == 'C' && b(i + 4) == '/' && b(i + 5) == '1' &&
            b(i + 6) == '.')) { ok = false }
      else {
        // header block ends at the first CRLFCRLF
        var he = ve + 2
        var blockEnd = -1
        while (blockEnd < 0 && he + 3 < b.length) {
          if (b(he) == CR && b(he + 1) == LF && b(he + 2) == CR && b(he + 3) == LF) blockEnd = he
          else he += 1
        }
        if (blockEnd < 0) ok = false
        else {
          val hv = new Array[UTF8String](WarcNames.length)
          if (!parseHeaders(b, ve + 2, blockEnd, WarcNames, hv)) ok = false
          else {
            val wtype = hv(0); val uri = hv(1); val date = hv(2)
            val clen = parseIntAscii(hv(3))
            val contentStart = blockEnd + 4
            if (wtype == null || clen < 0 || contentStart + clen > b.length) ok = false
            else {
              val contentEnd = contentStart + clen.toInt
              var status: Any = null
              var ctype: UTF8String = hv(4)
              var bodyFrom = contentStart
              // HTTP response payload: status line + headers + CRLFCRLF + entity
              if (wtype.toString == "response" && clen >= 12 &&
                  b(contentStart) == 'H' && b(contentStart + 1) == 'T' &&
                  b(contentStart + 2) == 'T' && b(contentStart + 3) == 'P' &&
                  b(contentStart + 4) == '/') {
                val sl = lineEnd(b, contentStart, contentEnd)
                if (sl > 0) {
                  // status code = first token after the first space
                  var sp = contentStart
                  while (sp < sl && b(sp) != ' '.toByte) sp += 1
                  if (sp + 3 < sl) {
                    val code = parseIntAscii(str(b, sp + 1, math.min(sp + 4, sl)))
                    if (code >= 100L && code <= 999L) status = code.toInt
                  }
                  // http header block
                  var hhe = sl + 2
                  var hEnd = -1
                  while (hEnd < 0 && hhe + 3 <= contentEnd) {
                    if (b(hhe) == CR && b(hhe + 1) == LF &&
                        hhe + 3 < contentEnd && b(hhe + 2) == CR && b(hhe + 3) == LF) hEnd = hhe
                    else hhe += 1
                  }
                  if (hEnd >= 0) {
                    val httpv = new Array[UTF8String](HttpNames.length)
                    if (parseHeaders(b, sl + 2, hEnd, HttpNames, httpv) && httpv(0) != null)
                      ctype = httpv(0)
                    bodyFrom = hEnd + 4
                  }
                }
              }
              recs += InternalRow(wtype, uri, date, status, ctype,
                str(b, bodyFrom, contentEnd))
              // advance past content + the two mandatory record-final CRLFs
              i = contentEnd
              if (i + 4 <= b.length && b(i) == CR && b(i + 1) == LF &&
                  b(i + 2) == CR && b(i + 3) == LF) i += 4
              else if (i < b.length) ok = false // missing separator mid-segment
            }
          }
        }
      }
    }
    if (recs.isEmpty) null else new GenericArrayData(recs.toArray[Any])
  }
}
