package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Real audio/video metadata extraction from a BINARY column — the
  * A/V sibling of [[ImageMeta]]: container format, sample rate,
  * channel count, and duration parsed straight from the public
  * header layouts, no codec, one bounded scan over the payload's
  * leading bytes. The metadata a training-data pipeline gates and
  * stratifies on (duration caps, sample-rate buckets, mono/stereo
  * mix, format census) needs no media runtime, so it runs as a
  * codegen expression inside the scan stage — the payload column is
  * read where it lies and never shuffled.
  *
  * Formats (public container specs):
  *  - WAV:  RIFF/"WAVE" chunk walk (chunks are word-aligned):
  *    channels/sample-rate/byte-rate from the "fmt " chunk, duration
  *    from the "data" chunk's size over the byte rate.
  *  - FLAC: "fLaC" + STREAMINFO (the mandatory first metadata
  *    block): bit-packed sample rate (20 bits), channels-1 (3),
  *    bits-per-sample-1 (5), total samples (36) at byte 18; duration
  *    = samples / rate.
  *  - MP3:  optional ID3v2 tag (syncsafe 28-bit size) skipped, then
  *    the first MPEG-1 Layer III frame header: bitrate and sample
  *    rate from the standard index tables, channel count from the
  *    mode field; duration estimated as audio bytes over the frame
  *    byte rate (exact for CBR — the header carries no length, so
  *    VBR files without a Xing header are genuinely estimate-only).
  *  - MP4:  ISO-BMFF box walk to moov/mvhd (v0 32-bit and v1 64-bit
  *    layouts): duration = mvhd duration over its timescale. Sample
  *    rate and channels stay NULL — they live per-track (stsd), a
  *    deliberate non-goal for container-level metadata.
  *
  * Output: struct(format string, sample_rate int?, channels int?,
  * duration_ms long?); NULL for payloads matching no signature or
  * truncated before their header fields — the caller's quarantine
  * split, not an error (same contract as [[ImageMeta]]).
  */
case class MediaMeta(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = MediaMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_media_meta"

  def compute(bytes: Array[Byte]): InternalRow = MediaMeta.parse(bytes)

  override protected def nullSafeEval(input: Any): Any =
    MediaMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mediaMetaParser", this,
      classOf[MediaMeta].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MediaMeta =
    copy(child = newChild)
}

object MediaMeta {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Column wrapper: binary payload → metadata struct (or null). */
  def mediaMeta(payload: Column): Column =
    GraftColumnBridge.column(MediaMeta(GraftColumnBridge.expression(payload)))

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
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean = {
    if (i + s.length > b.length) return false
    var k = 0
    while (k < s.length) {
      if (b(i + k) != s.charAt(k).toByte) return false
      k += 1
    }
    true
  }

  private def row(format: String, rate: Long, ch: Int, durMs: Long)
  : InternalRow = {
    if (rate == 0L || rate > Int.MaxValue || durMs < -1L) return null
    InternalRow(UTF8String.fromString(format),
      if (rate < 0) null else rate.toInt,
      if (ch < 0) null else ch,
      if (durMs < 0) null else durMs)
  }

  // MPEG-1 Layer III tables (index 0 and 15 are invalid/free)
  private val Mp3Bitrates = Array(-1, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 160, 192, 224, 256, 320, -1)
  private val Mp3Rates = Array(44100, 48000, 32000, -1)

  /** Null on unrecognized/truncated payloads. Called from both the
    * interpreted and the generated path. */
  def parse(b: Array[Byte]): InternalRow = {
    // 4 bytes = the smallest parseable payload (a bare MP3 frame
    // header); every branch bound-checks its own deeper reads
    if (b == null || b.length < 4) return null

    // WAV: RIFF container, WAVE form, word-aligned chunk walk
    if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) {
      var pos = 12
      var rate = -1L
      var ch = -1
      var byteRate = -1L
      var dataLen = -1L
      while (pos + 8 <= b.length) {
        val sz = le32(b, pos + 4)
        if (ascii(b, pos, "fmt ") && pos + 8 + 16 <= b.length) {
          ch = le16(b, pos + 10)
          rate = le32(b, pos + 12)
          byteRate = le32(b, pos + 16)
        } else if (ascii(b, pos, "data")) {
          dataLen = sz
        }
        // a declared size past the payload's end (header-only sample,
        // truncated file) ends the walk with whatever was captured
        val next = pos.toLong + 8L + sz + (sz & 1L)
        pos = if (next > b.length.toLong) b.length else next.toInt
      }
      if (rate <= 0) return null
      val durMs =
        if (byteRate > 0 && dataLen >= 0) dataLen * 1000L / byteRate
        else -1L
      return row("wav", rate, ch, durMs)
    }

    // FLAC: fLaC + STREAMINFO (mandatory first block, type 0)
    if (ascii(b, 0, "fLaC") && b.length >= 26 && (u8(b, 4) & 0x7F) == 0) {
      val sr = (u8(b, 18) << 12) | (u8(b, 19) << 4) | (u8(b, 20) >> 4)
      val ch = ((u8(b, 20) >> 1) & 0x7) + 1
      val samples = ((u8(b, 21) & 0xF).toLong << 32) | be32(b, 22)
      if (sr <= 0) return null
      return row("flac", sr.toLong, ch, samples * 1000L / sr)
    }

    // MP4 / ISO-BMFF: box walk to moov/mvhd. An ftyp box must lead
    // (the spec-compliant brand declaration — also what keeps random
    // binary from matching: the size+"ftyp" prefix is 8 exact bytes).
    if (ascii(b, 4, "ftyp")) {
      var pos = 0
      while (pos + 8 <= b.length) {
        val sz0 = be32(b, pos)
        val hdr = if (sz0 == 1L) 16 else 8
        val sz = if (sz0 == 1L) {
          if (pos + 16 > b.length) return null
          be64(b, pos + 8)
        } else if (sz0 == 0L) (b.length - pos).toLong // to end of file
        else sz0
        if (sz < hdr) return null
        if (ascii(b, pos + 4, "moov")) {
          // walk moov's children for mvhd
          var p2 = pos + hdr
          val end = math.min(b.length.toLong, pos + sz).toInt
          while (p2 + 8 <= end) {
            val s2 = be32(b, p2)
            if (s2 < 8) return null
            if (ascii(b, p2 + 4, "mvhd")) {
              val v = if (p2 + 8 < b.length) u8(b, p2 + 8) else return null
              if (v == 0 && p2 + 28 <= b.length) {
                val timescale = be32(b, p2 + 20)
                val dur = be32(b, p2 + 24)
                if (timescale <= 0) return null
                return row("mp4", -1L, -1, dur * 1000L / timescale)
              } else if (v == 1 && p2 + 40 <= b.length) {
                val timescale = be32(b, p2 + 28)
                val dur = be64(b, p2 + 32)
                if (timescale <= 0 || dur < 0) return null
                return row("mp4", -1L, -1, dur * 1000L / timescale)
              } else return null
            }
            p2 += s2.toInt
          }
          return null // moov without mvhd
        }
        if (sz > Int.MaxValue) return null
        pos += sz.toInt
      }
      return null // no moov before truncation
    }

    // MP3: skip ID3v2 if present, then an MPEG-1 Layer III header
    var off = 0
    if (ascii(b, 0, "ID3") && b.length >= 10) {
      // syncsafe 28-bit size, then the 10-byte tag header
      val sz = (u8(b, 6) << 21) | (u8(b, 7) << 14) |
        (u8(b, 8) << 7) | u8(b, 9)
      off = 10 + sz
    }
    if (off + 4 <= b.length && u8(b, off) == 0xFF &&
        (u8(b, off + 1) & 0xE0) == 0xE0) {
      val version = (u8(b, off + 1) >> 3) & 0x3 // 3 = MPEG-1
      val layer = (u8(b, off + 1) >> 1) & 0x3 // 1 = Layer III
      if (version == 3 && layer == 1) {
        val bitrate = Mp3Bitrates(u8(b, off + 2) >> 4)
        val rate = Mp3Rates((u8(b, off + 2) >> 2) & 0x3)
        val ch = if ((u8(b, off + 3) >> 6) == 3) 1 else 2
        if (bitrate > 0 && rate > 0) {
          // CBR estimate: audio bytes over the byte rate
          val durMs = (b.length - off).toLong * 8L / bitrate
          return row("mp3", rate.toLong, ch, durMs)
        }
      }
    }
    null
  }
}
