package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Real image-metadata extraction from a BINARY column: container
  * format, pixel width and height parsed straight from the public
  * PNG / GIF / JPEG / BMP header layouts — no codec, no decode, one
  * bounded scan over the first bytes of the payload. This is the
  * production counterpart of [[graft.operators.MultiModal]]'s stub
  * decoder: header metadata (the part a data pipeline filters and
  * statistics on — resolution gates, aspect-ratio buckets, format
  * mix) needs no image runtime at all, so it runs as a codegen
  * expression inside the scan stage, at 100 TB, with the payload
  * column read but never shuffled.
  *
  * Formats (public container specs):
  *  - PNG:  8-byte signature, IHDR chunk: width/height big-endian
  *    int32 at offsets 16/20.
  *  - GIF:  "GIF87a"/"GIF89a", logical-screen width/height
  *    little-endian uint16 at offsets 6/8.
  *  - JPEG: FF D8 then marker segments; dimensions live in the first
  *    SOFn frame header (FF C0-CF except C4/C8/CC): height/width
  *    big-endian uint16 at segment offsets 5/7. APPn/quant/etc
  *    segments are length-skipped, standalone markers (D0-D9, 01)
  *    have no length field.
  *  - BMP:  "BM", BITMAPINFOHEADER width/height little-endian int32
  *    at offsets 18/22 (height's sign encodes row order — reported
  *    as its absolute value).
  *  - WebP: RIFF/"WEBP" container; VP8X extended header (24-bit LE
  *    canvas-1 fields), VP8L lossless (14-bit packed dims behind the
  *    0x2F signature), or VP8 lossy (16-bit LE dims after the
  *    9D 01 2A start code) — whichever chunk leads.
  *
  * Output: struct(format string, width int, height int); NULL for
  * payloads that match no signature or are truncated before their
  * dimension fields — the caller's quarantine split, not an error.
  */
case class ImageMeta(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ImageMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_meta"

  def compute(bytes: Array[Byte]): InternalRow = ImageMeta.parse(bytes)

  override protected def nullSafeEval(input: Any): Any =
    ImageMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("imageMetaParser", this,
      classOf[ImageMeta].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

object ImageMeta {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Column wrapper: binary payload → metadata struct (or null). */
  def imageMeta(payload: Column): Column =
    GraftColumnBridge.column(ImageMeta(GraftColumnBridge.expression(payload)))

  // unsigned accessors over the raw payload
  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  private def row(format: String, w: Long, h: Long): InternalRow =
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) null
    else InternalRow(UTF8String.fromString(format), w.toInt, h.toInt)

  /** Null on unrecognized/truncated payloads. Called from both the
    * interpreted and the generated path. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 10) return null
    // PNG: \x89PNG\r\n\x1a\n + IHDR (first chunk by spec)
    if (b.length >= 24 &&
        u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0D && u8(b, 5) == 0x0A && u8(b, 6) == 0x1A &&
        u8(b, 7) == 0x0A &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return row("png", be32(b, 16), be32(b, 20))
    // GIF87a / GIF89a
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    // BMP: "BM" + BITMAPINFOHEADER at offset 14 (biSize >= 40).
    // "BM" alone is weak — ASCII text starting "BM..." (e.g. "BMW ")
    // satisfies it and four more printable bytes pass biSize >= 40, so
    // also require the spec-mandated zero reserved words at offsets
    // 6-9 and planes == 1 at offset 26, neither of which printable
    // text can satisfy.
    if (b.length >= 28 && b(0) == 'B' && b(1) == 'M' &&
        b(6) == 0 && b(7) == 0 && b(8) == 0 && b(9) == 0 &&
        le32(b, 14) >= 40L && le16(b, 26) == 1)
      return row("bmp", le32(b, 18), math.abs(le32(b, 22).toInt).toLong)
    // WebP: RIFF container, first chunk VP8X / VP8L / "VP8 "
    if (b.length >= 16 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
        b(11) == 'P') {
      if (b.length >= 30 &&
          b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == 'X')
        // canvas width/height stored minus one as 24-bit LE
        return row("webp",
          (le16(b, 24).toLong | (u8(b, 26).toLong << 16)) + 1L,
          (le16(b, 27).toLong | (u8(b, 29).toLong << 16)) + 1L)
      if (b.length >= 25 &&
          b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == 'L' &&
          u8(b, 20) == 0x2F) {
        // 14-bit width-1 then 14-bit height-1, LSB-first bitstream
        val bits = le32(b, 21)
        return row("webp", (bits & 0x3FFF) + 1L, ((bits >> 14) & 0x3FFF) + 1L)
      }
      if (b.length >= 30 &&
          b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == ' ' &&
          u8(b, 23) == 0x9D && u8(b, 24) == 0x01 && u8(b, 25) == 0x2A)
        return row("webp", (le16(b, 26) & 0x3FFF).toLong,
          (le16(b, 28) & 0x3FFF).toLong)
      return null // unknown leading chunk or truncated
    }
    // JPEG: marker-segment walk to the first SOFn
    if (u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xFF) return null // desync — not a marker
        val m = u8(b, i + 1)
        if (m == 0xFF) i += 1 // fill byte before a marker
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) i += 2 // standalone
        else if ((m >= 0xC0 && m <= 0xCF) &&
                 m != 0xC4 && m != 0xC8 && m != 0xCC) {
          // SOFn: len(2) precision(1) height(2) width(2)
          if (i + 8 >= b.length) return null
          return row("jpeg", be16(b, i + 7), be16(b, i + 5))
        }
        else {
          val len = be16(b, i + 2)
          if (len < 2) return null
          i += 2 + len
        }
      }
      return null // truncated before any SOF
    }
    null
  }
}
