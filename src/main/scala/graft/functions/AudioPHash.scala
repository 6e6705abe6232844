package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** AUDIO PERCEPTUAL HASHING from a BINARY column — the A/V twin of
  * [[ImagePHash]]: a REAL PCM decode of the public WAV container
  * (RIFF chunk walk, fmt parse, 16-bit PCM samples, little-endian,
  * interleaved channels) feeding the 64-frame ENERGY HASH in one
  * bounded pass inside whole-stage codegen:
  *
  *  - the sample stream is mono-mixed exactly (truncated integer
  *    mean across channels) and cut into 64 equal frames
  *    (`frame = t·64 / n`, t = sample index over the mixed stream);
  *  - frame energy `e[f] = Σ |mix(t)|` (exact long arithmetic);
  *  - one bit per frame: `e[f] > (Σ e) / 64` — aHash's mean-threshold
  *    construction applied to the time axis, the standard cheap
  *    audio fingerprint shape (energy-profile hashing; spectral
  *    variants slot into the same signature contract).
  *
  * All integer, so construction → decode → frame energies →
  * threshold replays in portable SQL — q_audio_ahash /
  * q_audio_neardup's DuckDB oracle checks the byte-level PCM decoder
  * end-to-end (the q_image_ahash precedent on the audio axis). The
  * signature is emitted as 8 non-negative row bytes (banding/oracle
  * form — 8 frames per row byte) plus the packed 64-bit long.
  *
  * WAV layout (public spec): "RIFF" size "WAVE", then chunks walked
  * by (id, size) — "fmt " must declare PCM (tag 1), 16 bits/sample;
  * "data" carries the interleaved LE16 samples. Chunks pad to even
  * offsets; unknown chunks are skipped. NULL for: no RIFF/WAVE
  * signature, non-PCM or non-16-bit formats, a data chunk shorter
  * than its declared size, or fewer than 64 mixed samples (one per
  * frame) — the quarantine contract.
  */
case class AudioPHash(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = AudioPHash.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_phash"

  def compute(bytes: Array[Byte]): InternalRow = AudioPHash.parse(bytes)

  override protected def nullSafeEval(input: Any): Any =
    AudioPHash.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("audioPHash", this,
      classOf[AudioPHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): AudioPHash =
    copy(child = newChild)
}

object AudioPHash {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("arows", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("ahash", LongType, nullable = false)))

  /** Column wrapper: binary payload → energy-hash struct (or null). */
  def audioPHash(payload: Column): Column =
    GraftColumnBridge.column(AudioPHash(GraftColumnBridge.expression(payload)))

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16u(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  private def le16s(b: Array[Byte], i: Int): Int =
    (le16u(b, i) << 16) >> 16
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3) << 24)

  /** Null on unrecognized/truncated/non-PCM payloads. Called from
    * both the interpreted and the generated path. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 44) return null
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return null
    // chunk walk: fmt before data by spec; unknown chunks skipped
    var i = 12
    var rate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (i + 8 <= b.length && (dataOff < 0 || rate < 0)) {
      val id = new String(b, i, 4, "US-ASCII")
      val len = le32(b, i + 4)
      if (len < 0 || i.toLong + 8 + len > b.length) return null // truncated
      if (id == "fmt ") {
        if (len < 16) return null
        if (le16u(b, i + 8) != 1) return null // PCM only
        channels = le16u(b, i + 10)
        rate = le32(b, i + 12)
        bits = le16u(b, i + 22)
      } else if (id == "data") {
        dataOff = i + 8; dataLen = len
      }
      i += 8 + len + (len & 1) // chunks pad to even offsets
    }
    if (rate <= 0 || channels < 1 || bits != 16 || dataOff < 0)
      return null
    val frameBytes = channels * 2
    val n = dataLen / frameBytes // mixed samples
    if (n < 64) return null // fewer samples than frames → no hash
    val energies = new Array[Long](64)
    var t = 0
    while (t < n) {
      var acc = 0
      var c = 0
      val o = dataOff + t * frameBytes
      while (c < channels) { acc += le16s(b, o + 2 * c); c += 1 }
      val mix = acc / channels // exact truncated integer mono mix
      energies((t.toLong * 64 / n).toInt) += math.abs(mix)
      t += 1
    }
    var total = 0L
    var f = 0
    while (f < 64) { total += energies(f); f += 1 }
    val mean = total / 64
    val arows = new Array[Int](8)
    var ahash = 0L
    f = 0
    while (f < 64) {
      if (energies(f) > mean) {
        arows(f / 8) |= 1 << (f % 8); ahash |= 1L << f
      }
      f += 1
    }
    InternalRow(UTF8String.fromString("wav"), rate, channels, n,
      new GenericArrayData(arows), ahash)
  }
}

/** Deterministic VALID WAV bytes WITH PCM samples per row — the
  * audio query fixture ([[SyntheticImage]]'s convention on the
  * audio axis). Closed-form in the id, so the DuckDB oracle derives
  * the expected signature from the construction arithmetic alone
  * while the engine path must genuinely walk the RIFF chunks and
  * decode the interleaved samples:
  *
  *   - quarantine residue: `id % 11 == 7` → the raw text bytes
  *     (NULL text → NULL payload, both dropped)
  *   - `gid = id / 4` (groups of 4 ids share a base waveform),
  *     `v = id % 4` (the near-duplicate variant)
  *   - samples per frame `spf = 4 + gid % 5`, `n = 64·spf` samples,
  *     `m = gid % 509 + 1`
  *   - sample `s(t) = (m·(t + 11)) % 4096 − 2048`, except frame
  *     `(7v) % 64` of a variant (`v > 0`) is amplified ×8 — a loud
  *     splice, flipping ~1 signature bit between same-gid variants
  *   - channels `= gid % 2 + 1` (stereo duplicates the sample on
  *     both channels, so the exact mono mix equals the sample —
  *     channel-count invariance the spec checks), sample rate
  *     `8000·(1 + gid % 3)` (metadata only; never affects the hash)
  */
case class SyntheticWav(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_synthetic_wav"

  def compute(id: Long, text: UTF8String): Array[Byte] =
    SyntheticWav.build(id, text)

  override protected def nullSafeEval(id: Any, text: Any): Any =
    SyntheticWav.build(id.asInstanceOf[Long],
      text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("syntheticWav", this,
      classOf[SyntheticWav].getName)
    nullSafeCodeGen(ctx, ev, (idc, tc) => s"""
      ${ev.value} = $ref.compute($idc, $tc);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SyntheticWav =
    copy(left = newLeft, right = newRight)
}

object SyntheticWav {

  /** Column wrapper: (id, text) → deterministic WAV payload. */
  def syntheticWav(id: Column, text: Column): Column =
    GraftColumnBridge.column(SyntheticWav(
      GraftColumnBridge.expression(id), GraftColumnBridge.expression(text)))

  /** The closed-form sample — the ONE formula the generator, the
    * spec, and the DuckDB oracle share. */
  def sample(id: Long, t: Int): Int = {
    val gid = id / 4; val v = id % 4
    val spf = 4 + (gid % 5).toInt
    val m = (gid % 509).toInt + 1
    val base = (m * (t + 11)) % 4096 - 2048
    if (v > 0 && t / spf == (7 * v) % 64) base * 8 else base
  }

  def build(id: Long, text: UTF8String): Array[Byte] = {
    if (id % 11 == 7) // quarantine residue: raw text bytes
      return if (text == null) null else text.getBytes
    val gid = id / 4
    val spf = 4 + (gid % 5).toInt
    val n = 64 * spf
    val channels = (gid % 2).toInt + 1
    val rate = 8000 * (1 + (gid % 3).toInt)
    val dataLen = n * channels * 2
    val out = new Array[Byte](44 + dataLen)
    def le16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def le32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def tag(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach {
        case (c, j) => out(o + j) = c
      }
    tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, channels)
    le32(24, rate); le32(28, rate * channels * 2)
    le16(32, channels * 2); le16(34, 16)
    tag(36, "data"); le32(40, dataLen)
    var t = 0
    while (t < n) {
      val s = sample(id, t)
      var c = 0
      while (c < channels) {
        le16(44 + (t * channels + c) * 2, s & 0xFFFF)
        c += 1
      }
      t += 1
    }
    out
  }
}
