package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Fns, ShingleHash, SimHash64}

/** Parity and edge-case specs for the custom codegen expressions. */
class ExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ShingleHash count parity with the string-shingle pipeline") {
    // incl. a double-space (empty word) and a doc shorter than n
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a  b c"),      // double space → empty middle word
      (3L, "x y"),          // shorter than n=3 → zero shingles
      (4L, "a a a a a")     // repeated words → dedup matters
    ).toDF("doc_id", "text")
    val fast = docs.select(col("doc_id"),
      size(ShingleHash.shingles(col("text"), 3)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val slow = docs.select(col("doc_id"),
      size(Fns.shingles(col("text"), 3)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(fast == slow, s"fast=$fast slow=$slow")
    assert(fast(3L) == 0)
    assert(fast(4L) == 1) // all shingles identical → one distinct
  }

  test("SimHash64: identical text → identical sig; near text → small hamming") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and agaim"),
      (3L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id"),
      SimHash64.simhash64(col("text")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) < ham(sigs(1L), sigs(3L)))
    assert(ham(sigs(1L), sigs(2L)) <= 16)
  }

  test("FloatVecDot: null array → null, length mismatch → shorter prefix") {
    import graft.functions.VectorExpressions.dotF
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f, 9.0f))),
      (2L, None, Some(Array(1.0f)))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), dotF(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(11.0)) // 1*3 + 2*4, extra element ignored
    assert(out(2L).isEmpty)
  }

  // ---- ImageMeta: hand-built REAL container bytes -------------------

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def be16b(v: Int) = b(v >> 8, v & 0xFF)
  private def le16b(v: Int) = b(v & 0xFF, v >> 8)
  private def be32b(v: Int) = b(v >>> 24, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)
  private def le32b(v: Int) = b(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, v >>> 24)

  private def pngBytes(w: Int, h: Int): Array[Byte] =
    b(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      be32b(13) ++ "IHDR".getBytes ++ be32b(w) ++ be32b(h) ++
      b(8, 6, 0, 0, 0) ++ be32b(0)

  private def gifBytes(w: Int, h: Int, ver: Char = '9'): Array[Byte] =
    s"GIF8${ver}a".getBytes ++ le16b(w) ++ le16b(h) ++ b(0xF7, 0, 0)

  private def jpegBytes(w: Int, h: Int, sof: Int, extraSegs: Int)
  : Array[Byte] = {
    val app = b(0xFF, 0xE1, 0x00, 0x06) ++ b(1, 2, 3, 4) // len 6
    val fill = b(0xFF) // fill byte before a marker
    b(0xFF, 0xD8) ++
      Array.fill(extraSegs)(app).flatten ++ fill ++
      b(0xFF, sof, 0x00, 0x0B, 8) ++ be16b(h) ++ be16b(w) ++
      b(1, 1, 0x11, 0) ++ b(0xFF, 0xD9)
  }

  private def bmpBytes(w: Int, h: Int): Array[Byte] =
    "BM".getBytes ++ le32b(54) ++ le32b(0) ++ le32b(54) ++
      le32b(40) ++ le32b(w) ++ le32b(h) ++ b(1, 0, 24, 0)

  private def le24b(v: Int) = b(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF)
  private def webpVp8x(w: Int, h: Int): Array[Byte] =
    "RIFF".getBytes ++ le32b(22) ++ "WEBPVP8X".getBytes ++ le32b(10) ++
      b(0x10, 0, 0, 0) ++ le24b(w - 1) ++ le24b(h - 1)
  private def webpVp8l(w: Int, h: Int): Array[Byte] = {
    val bits = (w - 1) | ((h - 1) << 14)
    "RIFF".getBytes ++ le32b(17) ++ "WEBPVP8L".getBytes ++ le32b(5) ++
      b(0x2F) ++ le32b(bits)
  }
  private def webpVp8(w: Int, h: Int): Array[Byte] =
    "RIFF".getBytes ++ le32b(22) ++ "WEBPVP8 ".getBytes ++ le32b(10) ++
      b(0x00, 0x00, 0x00) ++ b(0x9D, 0x01, 0x2A) ++
      le16b(w) ++ le16b(h)

  test("ImageMeta parses real PNG/GIF/JPEG/BMP headers, nulls the rest") {
    import graft.functions.ImageMeta.imageMeta
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> pngBytes(640, 480),
      2L -> gifBytes(13, 7),
      3L -> gifBytes(320, 200, ver = '7'),
      4L -> jpegBytes(1920, 1080, sof = 0xC0, extraSegs = 2),
      5L -> jpegBytes(33, 44, sof = 0xC2, extraSegs = 0), // progressive
      6L -> bmpBytes(800, 600),
      7L -> (bmpBytes(800, 600).take(20)), // truncated BMP
      8L -> pngBytes(10, 10).take(12), // truncated PNG
      9L -> "just some text".getBytes, // not an image
      10L -> Array.empty[Byte],
      11L -> null,
      // BMP bottom-up negative height → absolute value
      12L -> ("BM".getBytes ++ le32b(54) ++ le32b(0) ++ le32b(54) ++
        le32b(40) ++ le32b(64) ++ le32b(-32) ++ b(1, 0, 24, 0)),
      // JPEG with a DHT (C4) segment before the SOF — must be skipped
      13L -> (b(0xFF, 0xD8) ++ b(0xFF, 0xC4, 0x00, 0x04, 0, 0) ++
        b(0xFF, 0xC1, 0x00, 0x0B, 8) ++ be16b(21) ++ be16b(12) ++
        b(1, 1, 0x11, 0) ++ b(0xFF, 0xD9)),
      14L -> webpVp8x(2048, 1024),
      15L -> webpVp8l(300, 200),
      16L -> webpVp8(640, 352),
      // RIFF but not a recognizable WebP chunk
      17L -> ("RIFF".getBytes ++ le32b(10) ++ "WEBPJUNK".getBytes ++
        le32b(2) ++ b(0, 0)),
      // ASCII text starting "BM" — long enough that four printable
      // bytes at offset 14 pass the biSize >= 40 check; the reserved
      // bytes / planes guard must reject it (q_image_meta feeds raw
      // corpus text as the non-image residue)
      18L -> "BMW models and other text that is plainly not a bitmap"
        .getBytes)
    val df = rows.toDF("id", "payload")
    val got = df.select(col("id"), imageMeta(col("payload")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getString(1), r.getInt(2), r.getInt(3))))).toMap
    assert(got(1L).contains(("png", 640, 480)))
    assert(got(2L).contains(("gif", 13, 7)))
    assert(got(3L).contains(("gif", 320, 200)))
    assert(got(4L).contains(("jpeg", 1920, 1080)))
    assert(got(5L).contains(("jpeg", 33, 44)))
    assert(got(6L).contains(("bmp", 800, 600)))
    assert(got(7L).isEmpty)
    assert(got(8L).isEmpty)
    assert(got(9L).isEmpty)
    assert(got(10L).isEmpty)
    assert(got(11L).isEmpty)
    assert(got(12L).contains(("bmp", 64, 32)))
    assert(got(13L).contains(("jpeg", 12, 21)))
    assert(got(14L).contains(("webp", 2048, 1024)))
    assert(got(15L).contains(("webp", 300, 200)))
    assert(got(16L).contains(("webp", 640, 352)))
    assert(got(17L).isEmpty)
    assert(got(18L).isEmpty, s"'BM'-prefixed text parsed as bmp: ${got(18L)}")
  }

  // ---- MediaMeta (audio/video headers) -------------------------------

  private def le32x(v: Int) =
    b(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, (v >> 24) & 0xFF)
  private def be32x(v: Long) = b(((v >> 24) & 0xFF).toInt,
    ((v >> 16) & 0xFF).toInt, ((v >> 8) & 0xFF).toInt, (v & 0xFF).toInt)

  private def wavBytes(rate: Int, ch: Int, dataLen: Int,
                       junkChunkFirst: Boolean = false): Array[Byte] = {
    val fmt = "fmt ".getBytes ++ le32x(16) ++ le16b(1) ++ le16b(ch) ++
      le32x(rate) ++ le32x(rate * ch * 2) ++ le16b(ch * 2) ++ le16b(16)
    val junk = "JUNK".getBytes ++ le32x(3) ++ b(1, 2, 3, 0) // padded odd
    val data = "data".getBytes ++ le32x(dataLen)
    val body = (if (junkChunkFirst) junk else Array.empty[Byte]) ++
      fmt ++ data
    "RIFF".getBytes ++ le32x(4 + body.length) ++ "WAVE".getBytes ++ body
  }

  private def flacBytes(samples: Long): Array[Byte] =
    "fLaC".getBytes ++ b(0x80, 0, 0, 0x22) ++
      b(0x10, 0, 0x10, 0, 0, 0, 0, 0, 0, 0) ++
      b(0x0A, 0xC4, 0x42, 0xF0) ++ be32x(samples) ++ Array.fill(16)(0.toByte)

  private def mp3Bytes(pad: Int, id3: Int = -1): Array[Byte] = {
    val frame = b(0xFF, 0xFB, 0x90, 0x00) ++ Array.fill(pad)(' '.toByte)
    if (id3 < 0) frame
    else "ID3".getBytes ++ b(4, 0, 0) ++
      b((id3 >> 21) & 0x7F, (id3 >> 14) & 0x7F, (id3 >> 7) & 0x7F,
        id3 & 0x7F) ++ Array.fill(id3)(0.toByte) ++ frame
  }

  private def mp4Bytes(timescale: Int, dur: Long,
                       v1: Boolean = false): Array[Byte] = {
    val mvhd =
      if (!v1) be32x(108) ++ "mvhd".getBytes ++ b(0, 0, 0, 0) ++
        le32x(0) ++ le32x(0) ++ be32x(timescale) ++ be32x(dur)
      else be32x(120) ++ "mvhd".getBytes ++ b(1, 0, 0, 0) ++
        Array.fill(16)(0.toByte) ++ be32x(timescale) ++
        be32x(dur >> 32) ++ be32x(dur & 0xFFFFFFFFL)
    val moov = be32x(8L + mvhd.length) ++ "moov".getBytes ++ mvhd
    be32x(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ b(0, 0, 0, 0) ++
      moov
  }

  test("MediaMeta parses WAV/FLAC/MP3/MP4 headers, nulls the rest") {
    import graft.functions.MediaMeta.mediaMeta
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> wavBytes(16000, 2, 64000),
      // chunk walk must skip a padded odd-size chunk before fmt
      2L -> wavBytes(8000, 1, 8000, junkChunkFirst = true),
      3L -> flacBytes(44100L * 3),
      4L -> mp3Bytes(pad = 1596),      // 1600 bytes @128kbps = 100 ms
      5L -> mp3Bytes(pad = 1596, id3 = 200), // ID3v2 tag skipped
      6L -> mp4Bytes(1000, 2500L),
      7L -> mp4Bytes(90000, 90000L * 7, v1 = true), // 64-bit mvhd
      8L -> "RIFFraff text that is not a wave container".getBytes,
      9L -> wavBytes(16000, 2, 64000).take(20), // truncated before fmt
      10L -> "plain text".getBytes,
      11L -> Array.empty[Byte],
      12L -> null)
    val df = rows.toDF("id", "payload")
    val got = df.select(col("id"), mediaMeta(col("payload")).as("m"))
      .select(col("id"), col("m.format"), col("m.sample_rate"),
        col("m.channels"), col("m.duration_ms"))
      .collect()
      .map { r =>
        def oi(i: Int) = if (r.isNullAt(i)) None else Some(r.getInt(i))
        def ol(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getLong(0) ->
          (if (r.isNullAt(1)) None
           else Some((r.getString(1), oi(2), oi(3), ol(4))))
      }.toMap
    // 64000 bytes at 16000*2*2 B/s = 1000 ms
    assert(got(1L).contains(("wav", Some(16000), Some(2), Some(1000L))))
    assert(got(2L).contains(("wav", Some(8000), Some(1), Some(500L))))
    assert(got(3L).contains(("flac", Some(44100), Some(2), Some(3000L))))
    assert(got(4L).contains(("mp3", Some(44100), Some(2), Some(100L))))
    assert(got(5L).contains(("mp3", Some(44100), Some(2), Some(100L))))
    assert(got(6L).contains(("mp4", None, None, Some(2500L))))
    assert(got(7L).contains(("mp4", None, None, Some(7000L))))
    assert(got(8L).isEmpty, s"'RIFF'-prefixed text parsed: ${got(8L)}")
    assert(got(9L).isEmpty)
    assert(got(10L).isEmpty)
    assert(got(11L).isEmpty)
    assert(got(12L).isEmpty)
  }

  test("MediaMeta round-trips the synthetic payload builder against closed form") {
    import graft.operators.MultiModal
    val docs = (0L until 40L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val got = MultiModal.mediaMeta(
        docs.select(col("doc_id"),
          MultiModal.syntheticMediaPayload("doc_id", "text").as("payload")),
        "doc_id", "payload")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some((r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          r.getLong(4))))).toMap
    (0L until 40L).foreach { i =>
      val want = (i % 5) match {
        case 0 =>
          val r = (i % 3 + 1) * 8000
          Some(("wav", r, i % 2 + 1, (i % 500 + 1) * 1000 / r))
        case 1 =>
          Some(("flac", 44100L, 2L, (i * 441 + 100) * 1000 / 44100))
        case 2 => Some(("mp3", 44100L, 2L, (4 + i % 600) * 8 / 128))
        case 3 => Some(("mp4", -1L, -1L, i * 37 + 500))
        case _ => None
      }
      assert(got(i) == want, s"doc $i: got ${got(i)}, want $want")
    }
  }

  test("ImageMeta round-trips the synthetic payload builder against closed form") {
    import graft.operators.MultiModal
    val docs = (0L until 40L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val got = MultiModal.imageMeta(
        docs.select(col("doc_id"),
          MultiModal.syntheticImagePayload("doc_id", "text").as("payload")),
        "doc_id", "payload")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some((r.getString(1), r.getLong(2), r.getLong(3))))).toMap
    (0L until 40L).foreach { i =>
      val want = (i % 6) match {
        case 0 => Some(("png", i % 613 + 1, i % 479 + 1))
        case 1 => Some(("gif", i % 613 + 1, i % 479 + 1))
        case 2 => Some(("jpeg", i % 613 + 1, i % 479 + 1))
        case 3 => Some(("bmp", i % 613 + 1, i % 479 + 1))
        case 4 => Some(("webp", i % 613 + 1, i % 479 + 1))
        case _ => None
      }
      assert(got(i) == want, s"id $i: got ${got(i)}, want $want")
    }
  }

  test("NearestCentroidMicro: exact integer argmin, ties to lowest id, ragged → null") {
    import graft.functions.VectorExpressions
    // centroids: c0=(0,0), c1=(10,0), c2=(5,5)
    val cents = Array(0L, 0L, 10L, 0L, 5L, 5L)
    val rows = Seq(
      (1L, Seq(1L, 0L)),   // nearest c0 (d=1 vs 81 vs 41)
      (2L, Seq(9L, 0L)),   // nearest c1 (d=81 vs 1 vs 41)
      (3L, Seq(5L, 0L)),   // TIE c0/c1 (both 25) → lowest id c0
      (4L, Seq(5L, 4L)),   // nearest c2 (41 vs 41 vs 1) — tie c0/c1 beaten
      (5L, Seq(1L, 2L, 3L))) // ragged → null
    val out = rows.toDF("id", "vm")
      .select(col("id"),
        VectorExpressions.nearestCentroid(col("vm"), cents, 3, 2).as("nc"))
      .select(col("id"), col("nc.cluster"), col("nc.dist_micro2"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getLong(2)))))
      .toMap
    assert(out(1L) === Some((0, 1L)))
    assert(out(2L) === Some((1, 1L)))
    assert(out(3L) === Some((0, 25L)))
    assert(out(4L) === Some((2, 1L)))
    assert(out(5L) === None)
  }
}
