package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** IMAGE PERCEPTUAL HASHING from a BINARY column: a REAL pixel
  * decode of the uncompressed public container formats (24-bit BMP,
  * binary PPM "P6") feeding the two classic integer perceptual
  * signatures, in ONE bounded pass inside whole-stage codegen:
  *
  *  - '''aHash''' (average hash): box-mean downsample to a fixed
  *    8×8 grid (cell = truncated mean of its pixel block, pixel →
  *    grid cell by `gx = x·8 / W`), then one bit per cell — is the
  *    cell brighter than the truncated mean of the 64 cells.
  *  - '''dHash''' (difference/gradient hash): nearest-sample
  *    downsample to a 9×8 grid (`cell(gx,gy) = gray((gx·W)/9,
  *    (gy·H)/8)`), then one bit per horizontal gradient —
  *    `cell(gx) > cell(gx+1)` — 8 bits × 8 rows.
  *
  * Both are pure integer arithmetic over the decoded gray values
  * (`gray = (r+g+b)/3`, truncating), so the whole chain —
  * construction, decode, downsample, threshold — replays in portable
  * SQL: this is what lets q_image_neardup's DuckDB oracle check the
  * byte-level decoder end-to-end (the q_image_meta
  * derive-from-construction precedent, extended from headers to
  * pixels). The signature is emitted BOTH as two packed 64-bit longs
  * (production form) and as the 8 per-grid-row bytes of each (the
  * banding/oracle form: row bytes are non-negative ints, so band
  * keys and hamming distances stay inside portable signed SQL —
  * a full 64-bit signature would go negative when grid-row 7 sets
  * bit 63, and signed `//`-shifts diverge between engines).
  *
  * Formats (public layouts; compressed formats are the declared
  * model/codec seam — [[graft.operators.MultiModal.extractEmbeddings]]):
  *  - BMP: "BM", BITMAPINFOHEADER (biSize ≥ 40), biBitCount = 24,
  *    biCompression = 0; rows bottom-up (positive biHeight) or
  *    top-down (negative), stride padded to 4 bytes, pixels BGR.
  *  - PPM: "P6", ASCII width/height/maxval tokens ('#' comments
  *    allowed), single whitespace, then RGB rows top-down; maxval
  *    ≤ 255 (single-byte samples).
  *
  * NULL for: no signature match, truncated pixel data, unsupported
  * bit depth/compression, or dimensions below the 8×8 grid — the
  * quarantine contract (a corrupt blob at 100 TB must surface as a
  * filterable row, never a task failure).
  *
  * Scale shape: O(W·H) per payload — the irreducible decode cost —
  * as one codegen projection in the scan stage; payload bytes never
  * shuffle, only the 2×8-byte signatures do.
  */
case class ImagePHash(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ImagePHash.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_phash"

  def compute(bytes: Array[Byte]): InternalRow = ImagePHash.parse(bytes)

  override protected def nullSafeEval(input: Any): Any =
    ImagePHash.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("imagePHash", this,
      classOf[ImagePHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ImagePHash =
    copy(child = newChild)
}

object ImagePHash {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("arows", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("ahash", LongType, nullable = false),
    StructField("drows", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("dhash", LongType, nullable = false)))

  /** Column wrapper: binary payload → perceptual-hash struct (or null). */
  def imagePHash(payload: Column): Column =
    GraftColumnBridge.column(ImagePHash(GraftColumnBridge.expression(payload)))

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3) << 24)

  /** Decoded-image view: gray value at image coordinates (top-left
    * origin) computed straight off the payload bytes — no pixel
    * buffer is ever materialized, the two grid passes read in place. */
  private[functions] final class Gray(b: Array[Byte], val w: Int, val h: Int,
                           pixOff: Int, stride: Int, topDown: Boolean,
                           bgr: Boolean, val format: String) {
    def apply(x: Int, y: Int): Int = {
      val fileRow = if (topDown) y else h - 1 - y
      val o = pixOff + fileRow * stride + x * 3
      // channel order is irrelevant to the truncated mean
      (u8(b, o) + u8(b, o + 1) + u8(b, o + 2)) / 3
    }
  }

  /** One BMP frame decoded at `off` inside a (possibly multi-frame)
    * payload; `consumed` = header + pixel bytes, so consecutive
    * frames concatenate with no gap (the frame-stream layout
    * [[ImageFrameHashes]] walks). */
  private[functions] final case class BmpFrame(g: Gray, consumed: Int)

  private[functions] def openBmpAt(b: Array[Byte], off: Int): BmpFrame = {
    if (b.length - off < 54 || b(off) != 'B' || b(off + 1) != 'M')
      return null
    val pixOff = le32(b, off + 10)
    if (le32(b, off + 14) < 40) return null // biSize: BITMAPINFOHEADER+
    val w = le32(b, off + 18)
    val hRaw = le32(b, off + 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (le16(b, off + 26) != 1) return null // planes
    if (le16(b, off + 28) != 24) return null // only uncompressed 24-bit
    if (le32(b, off + 30) != 0) return null // BI_RGB
    if (w < 8 || h < 8 || w > (1 << 14) || h > (1 << 14)) return null
    val stride = (w * 3 + 3) & ~3
    if (pixOff < 54 ||
        off.toLong + pixOff + stride.toLong * h > b.length)
      return null // truncated pixel data → quarantine
    BmpFrame(new Gray(b, w, h, off + pixOff, stride, topDown,
      bgr = true, "bmp"), pixOff + stride * h)
  }

  private def openBmp(b: Array[Byte]): Gray = {
    val f = openBmpAt(b, 0)
    if (f == null) null else f.g
  }

  /** The box-mean 8×8 aHash of a decoded view: (row bytes, packed
    * long) — shared by the single-image hash and the frame walk. */
  private[functions] def ahashOf(g: Gray): (Array[Int], Long) = {
    val w = g.w; val h = g.h
    val sums = new Array[Long](64)
    val counts = new Array[Int](64)
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      var x = 0
      while (x < w) {
        val c = gy * 8 + x * 8 / w
        sums(c) += g(x, y); counts(c) += 1
        x += 1
      }
      y += 1
    }
    val cells = new Array[Int](64)
    var total = 0L
    var i = 0
    while (i < 64) {
      cells(i) = (sums(i) / counts(i)).toInt // every cell non-empty
      total += cells(i)
      i += 1
    }
    val mean = total / 64
    val arows = new Array[Int](8)
    var ahash = 0L
    i = 0
    while (i < 64) {
      if (cells(i) > mean) { arows(i / 8) |= 1 << (i % 8); ahash |= 1L << i }
      i += 1
    }
    (arows, ahash)
  }

  private def openPpm(b: Array[Byte]): Gray = {
    if (b.length < 9 || b(0) != 'P' || b(1) != '6') return null
    var i = 2
    val dims = new Array[Int](3)
    var d = 0
    while (d < 3) {
      // skip whitespace and '#' comment lines between tokens
      var moved = true
      while (moved && i < b.length) {
        moved = false
        while (i < b.length && (b(i) == ' ' || b(i) == '\t' ||
          b(i) == '\n' || b(i) == '\r')) { i += 1; moved = true }
        if (i < b.length && b(i) == '#') {
          while (i < b.length && b(i) != '\n') i += 1
          moved = true
        }
      }
      var v = 0L
      val start = i
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); if (v > Int.MaxValue) return null
        i += 1
      }
      if (i == start) return null // token missing → not a valid P6
      dims(d) = v.toInt
      d += 1
    }
    if (i >= b.length) return null
    // the single separator byte after maxval MUST be whitespace
    // (P6 spec) — anything else means the header is malformed and
    // decoding would read pixel data shifted by the bad byte
    if (b(i) != ' ' && b(i) != '\t' && b(i) != '\n' && b(i) != '\r')
      return null
    i += 1
    val (w, h, maxVal) = (dims(0), dims(1), dims(2))
    if (maxVal < 1 || maxVal > 255) return null // 2-byte samples: no
    if (w < 8 || h < 8 || w > (1 << 14) || h > (1 << 14)) return null
    val stride = w * 3
    if (i.toLong + stride.toLong * h > b.length) return null
    new Gray(b, w, h, i, stride, topDown = true, bgr = false, "ppm")
  }

  /** Null on unrecognized/truncated/too-small payloads. Called from
    * both the interpreted and the generated path. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 9) return null
    var g = openBmp(b)
    if (g == null) g = openPpm(b)
    if (g == null) return null
    val w = g.w; val h = g.h
    // aHash: one pass accumulating the 8×8 box sums (shared helper)
    val (arows, ahash) = ahashOf(g)
    // dHash: 9×8 nearest-sample grid, horizontal gradients
    val drows = new Array[Int](8)
    var dhash = 0L
    var gy = 0
    while (gy < 8) {
      val ys = gy * h / 8
      var prev = g(0, ys) // gx=0 sample: (0*w)/9 = 0
      var gx = 0
      while (gx < 8) {
        val next = g((gx + 1) * w / 9, ys)
        if (prev > next) {
          drows(gy) |= 1 << gx; dhash |= 1L << (gy * 8 + gx)
        }
        prev = next
        gx += 1
      }
      gy += 1
    }
    InternalRow(UTF8String.fromString(g.format), w, h,
      new GenericArrayData(arows), ahash, new GenericArrayData(drows),
      dhash)
  }
}

/** Deterministic VALID pixel-image bytes per row — the query fixture
  * for the perceptual-hash family ([[graft.operators.MultiModal
  * .syntheticImagePayload]]'s convention, extended from headers to
  * full pixel data). Every field is closed-form in the id, so the
  * DuckDB oracle derives the expected signature from the CONSTRUCTION
  * arithmetic alone — it never parses a byte — while the engine path
  * must genuinely decode the container it is handed:
  *
  *   - quarantine residue: `id % 11 == 7` → the raw text bytes (not
  *     an image; the decoder must yield NULL). A NULL text yields a
  *     NULL payload for EVERY residue (the expression is null-safe
  *     on both children) — the sf corpora carry no null texts, and
  *     the oracle's drop rule covers both.
  *   - `gid = id / 4` (groups of 4 ids share a base image),
  *     `v = id % 4` (the near-duplicate variant)
  *   - `W = 8·(1 + gid % 3)`, `H = 8·(1 + gid % 2)`,
  *     `m = gid % 251 + 1`
  *   - gray pixel `p(x,y) = (m·(3 + 7x + 11y) + P) % 256` where the
  *     perturbation `P = 128` exactly when `v > 0` and (x, y) falls
  *     in aHash grid cell `((3v) % 8, (5v) % 8)` — same-gid variants
  *     are near-identical images differing in one grid cell
  *   - container: `id % 7 == 6` → PPM P6; otherwise 24-bit BMP,
  *     top-down (negative height) when `id % 5 == 0`, bottom-up
  *     otherwise — container choice never affects the decoded pixels,
  *     so the oracle is container-blind while the parser is not.
  */
case class SyntheticImage(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_synthetic_image"

  def compute(id: Long, text: UTF8String): Array[Byte] =
    SyntheticImage.build(id, text)

  override protected def nullSafeEval(id: Any, text: Any): Any =
    SyntheticImage.build(id.asInstanceOf[Long],
      text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("syntheticImage", this,
      classOf[SyntheticImage].getName)
    nullSafeCodeGen(ctx, ev, (idc, tc) => s"""
      ${ev.value} = $ref.compute($idc, $tc);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SyntheticImage =
    copy(left = newLeft, right = newRight)
}

object SyntheticImage {

  /** Column wrapper: (id, text) → deterministic image payload. */
  def syntheticImage(id: Column, text: Column): Column =
    GraftColumnBridge.column(SyntheticImage(
      GraftColumnBridge.expression(id), GraftColumnBridge.expression(text)))

  /** The closed-form gray value — the ONE formula the generator, the
    * spec, and the DuckDB oracle share. */
  def pixel(id: Long, x: Int, y: Int): Int = {
    val gid = id / 4; val v = id % 4
    val w = 8 * (1 + (gid % 3).toInt); val h = 8 * (1 + (gid % 2).toInt)
    val m = (gid % 251).toInt + 1
    val pert = if (v > 0 && x * 8 / w == (3 * v) % 8 &&
      y * 8 / h == (5 * v) % 8) 128 else 0
    ((m * (3 + 7 * x + 11 * y) + pert) % 256).toInt
  }

  def build(id: Long, text: UTF8String): Array[Byte] = {
    if (id % 11 == 7) // quarantine residue: raw text bytes
      return if (text == null) null else text.getBytes
    val gid = id / 4
    val w = 8 * (1 + (gid % 3).toInt); val h = 8 * (1 + (gid % 2).toInt)
    if (id % 7 == 6) { // PPM P6, top-down rows
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + w * h * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var o = header.length
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = pixel(id, x, y).toByte
          out(o) = p; out(o + 1) = p; out(o + 2) = p
          o += 3; x += 1
        }
        y += 1
      }
      out
    } else { // 24-bit BMP, BI_RGB; top-down for the id % 5 == 0 residue
      val topDown = id % 5 == 0
      val stride = (w * 3 + 3) & ~3
      val size = 54 + stride * h
      val out = new Array[Byte](size) // zero-filled → padding bytes 0
      def le16(o: Int, v: Int): Unit = {
        out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      }
      def le32(o: Int, v: Int): Unit = {
        out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
        out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
      }
      out(0) = 'B'; out(1) = 'M'
      le32(2, size); le32(10, 54)
      le32(14, 40) // BITMAPINFOHEADER
      le32(18, w); le32(22, if (topDown) -h else h)
      le16(26, 1); le16(28, 24); le32(30, 0)
      var y = 0
      while (y < h) {
        val fileRow = if (topDown) y else h - 1 - y
        var o = 54 + fileRow * stride
        var x = 0
        while (x < w) {
          val p = pixel(id, x, y).toByte
          out(o) = p; out(o + 1) = p; out(o + 2) = p
          o += 3; x += 1
        }
        y += 1
      }
      out
    }
  }
}

/** FRAME-FINGERPRINT extraction for VIDEO near-dup dedup: the
  * payload is an uncompressed FRAME STREAM — consecutive 24-bit BMP
  * images back to back (each frame self-describing: header + pixel
  * bytes, no gaps; compressed video rides the codec seam like every
  * other compressed format) — and each frame yields its box-mean
  * 8×8 aHash ([[ImagePHash]]'s construction, shared code) in ONE
  * bounded pass inside whole-stage codegen.
  *
  * Output: array of (frame_idx, ahash, k1, k2) — ahash is the packed
  * 64-bit signature; k1/k2 pack signature rows 0-3 and 4-7 into two
  * NON-NEGATIVE ≤ 2³²-bit longs, the portable join keys the
  * inverted-index pair scan (and its DuckDB oracle) equi-joins on
  * (a full 64-bit key could go negative — the rowBandedPairs
  * portability rule).
  *
  * NULL (quarantine) for: payloads whose first bytes are not a valid
  * frame, any malformed/truncated frame mid-stream, trailing bytes
  * after the last frame, or more than `maxFrames` frames — a corrupt
  * stream surfaces as a filterable row, never a task failure and
  * never a silently half-hashed video.
  */
case class ImageFrameHashes(child: Expression, maxFrames: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ImageFrameHashes.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_frame_hashes"

  def compute(bytes: Array[Byte]): GenericArrayData =
    ImageFrameHashes.parse(bytes, maxFrames)

  override protected def nullSafeEval(input: Any): Any =
    ImageFrameHashes.parse(input.asInstanceOf[Array[Byte]], maxFrames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("imageFrameHashes", this,
      classOf[ImageFrameHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ImageFrameHashes =
    copy(child = newChild)
}

object ImageFrameHashes {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("ahash", LongType, nullable = false),
    StructField("k1", LongType, nullable = false),
    StructField("k2", LongType, nullable = false))),
    containsNull = false)

  /** Column wrapper: frame-stream payload → frame-hash array (or null). */
  def imageFrameHashes(payload: Column, maxFrames: Int = 64): Column =
    GraftColumnBridge.column(ImageFrameHashes(
      GraftColumnBridge.expression(payload), maxFrames))

  def parse(b: Array[Byte], maxFrames: Int): GenericArrayData = {
    if (b == null || b.length < 54) return null
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    var off = 0
    while (off < b.length) {
      if (out.size >= maxFrames) return null // over-long stream
      val f = ImagePHash.openBmpAt(b, off)
      if (f == null) return null // malformed/truncated frame
      val (arows, ahash) = ImagePHash.ahashOf(f.g)
      var k1 = 0L; var k2 = 0L
      var j = 0
      while (j < 4) {
        k1 |= arows(j).toLong << (8 * j)
        k2 |= arows(j + 4).toLong << (8 * j)
        j += 1
      }
      out += InternalRow(out.size, ahash, k1, k2)
      off += f.consumed
    }
    if (out.isEmpty) null else new GenericArrayData(out.toArray)
  }
}

/** Deterministic VALID frame-stream bytes per row — the video query
  * fixture ([[SyntheticImage]]'s convention, one dimension up):
  * `F = 3 + gid % 3` consecutive 8×8 24-bit BMP frames, every field
  * closed-form in the id so the DuckDB oracle derives each frame's
  * signature from the construction arithmetic alone:
  *
  *   - quarantine residue: `id % 11 == 7` → the raw text bytes
  *   - `gid = id / 4`, `v = id % 4`, `m = gid % 251 + 1`
  *   - frame f's gray pixel `p(f,x,y) = ((m + 37f)·(3 + 7x + 11y))
  *     % 256`, EXCEPT the variant's replaced frame — `v > 0` swaps
  *     frame `v % F` for the pattern `((m·53 + v·91 + 7)·(3 + 7x +
  *     11y)) % 256` — so same-gid videos share F−1 exact frames (a
  *     re-encode/edit of the same footage), while distinct gids
  *     share frames only by hash coincidence.
  */
case class SyntheticVideo(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_synthetic_video"

  def compute(id: Long, text: UTF8String): Array[Byte] =
    SyntheticVideo.build(id, text)

  override protected def nullSafeEval(id: Any, text: Any): Any =
    SyntheticVideo.build(id.asInstanceOf[Long],
      text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("syntheticVideo", this,
      classOf[SyntheticVideo].getName)
    nullSafeCodeGen(ctx, ev, (idc, tc) => s"""
      ${ev.value} = $ref.compute($idc, $tc);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SyntheticVideo =
    copy(left = newLeft, right = newRight)
}

object SyntheticVideo {

  /** Column wrapper: (id, text) → deterministic frame-stream payload. */
  def syntheticVideo(id: Column, text: Column): Column =
    GraftColumnBridge.column(SyntheticVideo(
      GraftColumnBridge.expression(id), GraftColumnBridge.expression(text)))

  def nFrames(id: Long): Int = 3 + ((id / 4) % 3).toInt

  /** The closed-form gray value of frame f — the ONE formula the
    * generator, the spec, and the DuckDB oracle share. */
  def pixel(id: Long, f: Int, x: Int, y: Int): Int = {
    val gid = id / 4; val v = id % 4
    val m = (gid % 251).toInt + 1
    val mult =
      if (v > 0 && f == (v % nFrames(id)).toInt) m * 53 + v.toInt * 91 + 7
      else m + 37 * f
    (mult * (3 + 7 * x + 11 * y)) % 256
  }

  def build(id: Long, text: UTF8String): Array[Byte] = {
    if (id % 11 == 7) // quarantine residue: raw text bytes
      return if (text == null) null else text.getBytes
    val frames = nFrames(id)
    val stride = 24 // 8 px × 3 bytes, already 4-aligned
    val frameLen = 54 + stride * 8
    val out = new Array[Byte](frames * frameLen)
    def le16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def le32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    var f = 0
    while (f < frames) {
      val base = f * frameLen
      out(base) = 'B'; out(base + 1) = 'M'
      le32(base + 2, frameLen); le32(base + 10, 54)
      le32(base + 14, 40); le32(base + 18, 8); le32(base + 22, 8)
      le16(base + 26, 1); le16(base + 28, 24); le32(base + 30, 0)
      var y = 0
      while (y < 8) {
        val o0 = base + 54 + (7 - y) * stride // bottom-up rows
        var x = 0
        while (x < 8) {
          val p = pixel(id, f, x, y).toByte
          val o = o0 + x * 3
          out(o) = p; out(o + 1) = p; out(o + 2) = p
          x += 1
        }
        y += 1
      }
      f += 1
    }
    out
  }
}
