package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ImagePHash, SyntheticImage}
import graft.operators.MultiModal

/** Image perceptual-hash family (round 14): the pixel decoder is
  * checked against HAND-BUILT container bytes and a test-local
  * reference hash (not the SyntheticImage generator, so a shared bug
  * cannot cancel out), container invariance (BMP bottom-up, BMP
  * top-down, and PPM of the same pixels hash identically), the
  * quarantine NULLs, and the banded pair scan against a brute-force
  * all-pairs hamming reference (the pigeonhole recall contract). */
class ImagePHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- test-local reference: grids + hashes from a pixel accessor --
  private def refHash(pix: (Int, Int) => Int, w: Int, h: Int)
  : (Array[Int], Array[Int]) = {
    val sums = Array.fill(64)(0L); val counts = Array.fill(64)(0)
    for (y <- 0 until h; x <- 0 until w) {
      val c = (y * 8 / h) * 8 + (x * 8 / w)
      sums(c) += pix(x, y); counts(c) += 1
    }
    val cells = Array.tabulate(64)(i => (sums(i) / counts(i)).toInt)
    val mean = cells.map(_.toLong).sum / 64
    val arows = Array.fill(8)(0)
    for (i <- 0 until 64 if cells(i) > mean) arows(i / 8) |= 1 << (i % 8)
    val drows = Array.fill(8)(0)
    for (gy <- 0 until 8; gx <- 0 until 8) {
      val a = pix(gx * w / 9, gy * h / 8)
      val b = pix((gx + 1) * w / 9, gy * h / 8)
      if (a > b) drows(gy) |= 1 << gx
    }
    (arows, drows)
  }

  // ---- hand byte-builders (independent of SyntheticImage.build) ----
  private def bmp(pix: (Int, Int) => Int, w: Int, h: Int,
                  topDown: Boolean): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val out = new Array[Byte](54 + stride * h)
    def le16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def le32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'; le32(2, out.length); le32(10, 54)
    le32(14, 40); le32(18, w); le32(22, if (topDown) -h else h)
    le16(26, 1); le16(28, 24); le32(30, 0)
    for (y <- 0 until h; x <- 0 until w) {
      val fileRow = if (topDown) y else h - 1 - y
      val o = 54 + fileRow * stride + x * 3
      val p = pix(x, y).toByte
      out(o) = p; out(o + 1) = p; out(o + 2) = p
    }
    out
  }

  private def ppm(pix: (Int, Int) => Int, w: Int, h: Int,
                  comment: Boolean = false): Array[Byte] = {
    val hdr = (if (comment) s"P6\n# a comment line\n$w $h\n255\n"
               else s"P6\n$w $h\n255\n").getBytes("US-ASCII")
    val out = new Array[Byte](hdr.length + w * h * 3)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    for (y <- 0 until h; x <- 0 until w) {
      val o = hdr.length + (y * w + x) * 3
      val p = pix(x, y).toByte
      out(o) = p; out(o + 1) = p; out(o + 2) = p
    }
    out
  }

  private def hashOf(payloads: Seq[Array[Byte]])
  : Map[Int, Option[(Seq[Int], Seq[Int], Long, Long)]] = {
    val df = payloads.zipWithIndex.map { case (p, i) => (i, p) }
      .toDF("id", "payload")
    df.select(col("id"),
        ImagePHash.imagePHash(col("payload")).as("ph"))
      .collect().map { r =>
        r.getInt(0) -> Option(r.getStruct(1)).map { s =>
          (s.getSeq[Int](3), s.getSeq[Int](5), s.getLong(4), s.getLong(6))
        }
      }.toMap
  }

  test("decoder matches the reference hash; containers are invariant") {
    val w = 9; val h = 16 // stride 28 → one BMP pad byte per row
    val pix = (x: Int, y: Int) => (x * 29 + y * 53 + 7) % 256
    val (ea, ed) = refHash(pix, w, h)
    val got = hashOf(Seq(
      bmp(pix, w, h, topDown = false),
      bmp(pix, w, h, topDown = true),
      ppm(pix, w, h),
      ppm(pix, w, h, comment = true)))
    for (i <- 0 to 3) {
      val Some((ar, dr, ah, dh)) = got(i)
      assert(ar == ea.toSeq, s"payload $i arows")
      assert(dr == ed.toSeq, s"payload $i drows")
      // packed longs are exactly the row bytes
      assert(ah == ea.zipWithIndex.map { case (r, j) =>
        r.toLong << (8 * j) }.reduce(_ | _))
      assert(dh == ed.zipWithIndex.map { case (r, j) =>
        r.toLong << (8 * j) }.reduce(_ | _))
    }
  }

  test("quarantine: truncation, depth, compression, size, non-images → NULL") {
    val pix = (x: Int, y: Int) => (x + y) % 256
    val good = bmp(pix, 8, 8, topDown = false)
    val truncated = good.take(good.length - 1)
    val bpp32 = good.clone(); bpp32(28) = 32
    val compressed = good.clone(); compressed(30) = 1 // BI_RLE8
    val tooSmall = bmp(pix, 8, 8, topDown = false).clone()
    tooSmall(18) = 7 // width 7 < the 8×8 grid
    val ppmWide = ppm(pix, 8, 8)
    // maxval 999 → 2-byte samples, unsupported
    val ppm16 = ("P6\n8 8\n999\n" + "x" * 400).getBytes("US-ASCII")
    val text = "BMW makes cars, not bitmaps P6 either".getBytes
    val got = hashOf(Seq(good, truncated, bpp32, compressed, tooSmall,
      ppmWide, ppm16, text))
    assert(got(0).isDefined && got(5).isDefined)
    for (i <- Seq(1, 2, 3, 4, 6, 7))
      assert(got(i).isEmpty, s"payload $i should be quarantined")
  }

  test("near-identical pair collides at radius 2; opposite images don't") {
    val base = (x: Int, y: Int) => if ((x / 2 + y / 2) % 2 == 0) 200 else 40
    // one grid cell (16×16 → 2×2 blocks) brightened: ≤ a few bits off
    val near = (x: Int, y: Int) =>
      if (x / 2 == 3 && y / 2 == 5) 255 else base(x, y)
    val inverse = (x: Int, y: Int) => 240 - base(x, y)
    val docs = Seq(
      (0L, bmp(base, 16, 16, topDown = false)),
      (1L, bmp(near, 16, 16, topDown = false)),
      (2L, bmp(inverse, 16, 16, topDown = false))
    ).toDF("doc_id", "payload")
    val pairs = MultiModal
      .imageNearDupPairs(docs, "doc_id", "payload", maxHamming = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"planted near-dup missing: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      s"inverse image paired: $pairs")
  }

  test("banded pairs == brute-force hamming pairs (pigeonhole recall)") {
    val ids = (0L until 240L).filter(_ % 11 != 7)
    val docs = ids.map(id =>
      (id, SyntheticImage.build(id, null))).toDF("doc_id", "payload")
    val sigs = MultiModal
      .imagePHashSignatures(docs, "doc_id", "payload")
      .select("doc_id", "ahash").as[(Long, Long)].collect().toMap
    assert(sigs.size == ids.size) // every non-quarantine id decodes
    val expected = (for {
      a <- ids; b <- ids if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 2
    } yield (a, b)).toSet
    val got = MultiModal
      .imageNearDupPairs(docs, "doc_id", "payload", maxHamming = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    // the construction actually plants work: some variant pairs exist
    assert(expected.nonEmpty)
  }

  test("wide banded pairs == brute-force COMBINED hamming pairs (128-bit pigeonhole recall)") {
    val ids = (0L until 240L).filter(_ % 11 != 7)
    val docs = ids.map(id =>
      (id, SyntheticImage.build(id, null))).toDF("doc_id", "payload")
    val sigs = MultiModal
      .imagePHashSignatures(docs, "doc_id", "payload")
      .select("doc_id", "ahash", "dhash")
      .as[(Long, Long, Long)].collect()
      .map { case (id, a, d) => id -> (a, d) }.toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (h <- Seq(1, 2, 4)) { // exercises the 3-band floor AND h+1 bands
      val expected = (for {
        a <- ids; b <- ids if a < b
        if ham(sigs(a)._1, sigs(b)._1) + ham(sigs(a)._2, sigs(b)._2) <= h
      } yield (a, b)).toSet
      val got = MultiModal
        .imageNearDupPairsWide(docs, "doc_id", "payload", maxHamming = h)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got == expected,
        s"h=$h missing=${expected -- got} extra=${got -- expected}")
    }
    // the combined radius is a SUBSET of the aHash-only radius at the
    // same h (dHash distance can only add bits) — the precision claim
    val narrow = MultiModal
      .imageNearDupPairs(docs, "doc_id", "payload", maxHamming = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val wide2 = MultiModal
      .imageNearDupPairsWide(docs, "doc_id", "payload", maxHamming = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(wide2.subsetOf(narrow))
  }

  test("imageKeepManifest: first-fail reasons, NULL dims on quarantine, keep-min dup side") {
    val imgA = SyntheticImage.build(4L, null)  // 16×16 = 256 px
    val rows = Seq[(Long, Int, Array[Byte])](
      (10L, 200, imgA),                        // kept (min of dup group)
      (11L, 200, imgA),                        // identical → near_dup
      (20L, 404, SyntheticImage.build(8L, null)),  // valid image, but 404
      (21L, 404, "junk-bytes".getBytes("UTF-8")),  // 404 beats not_image
      (30L, 200, "junk-bytes".getBytes("UTF-8")),  // not_image
      (40L, 200, SyntheticImage.build(0L, null)),  // 8×8 = 64 px → low_res
      (50L, 200, SyntheticImage.build(16L, null))) // 16×8 = 128 px → kept
    val got = MultiModal.imageKeepManifest(
        rows.toDF("doc_id", "status", "payload"),
        "doc_id", "status", "payload", minPixels = 128L, maxHamming = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3)), r.getString(4))))
      .toMap
    assert(got(10L) == ((200L, Some(16L), Some(16L), "kept")))
    assert(got(11L) == ((200L, Some(16L), Some(16L), "near_dup")))
    assert(got(20L) == ((404L, Some(24L), Some(8L), "http_error")))
    assert(got(21L) == ((404L, None, None, "http_error")))
    assert(got(30L) == ((200L, None, None, "not_image")))
    assert(got(40L) == ((200L, Some(8L), Some(8L), "low_res")))
    assert(got(50L) == ((200L, Some(16L), Some(8L), "kept")))
    assert(got.size == rows.size)
  }

  test("dHash: ramps set gradient bits exactly; aHash splits by mean") {
    val up = (x: Int, y: Int) => x * 13 % 251
    val down = (x: Int, y: Int) => 250 - x * 13 % 251
    val got = hashOf(Seq(
      ppm(up, 16, 8), ppm(down, 16, 8)))
    val Some((_, drUp, _, _)) = got(0)
    val Some((_, drDown, _, _)) = got(1)
    // x*13%251 is strictly increasing for x in [0,16): samples too
    assert(drUp.forall(_ == 0), s"increasing ramp: $drUp")
    assert(drDown.forall(_ == 255), s"decreasing ramp: $drDown")
    // aHash of a half-dark half-bright image: exactly the bright half
    val half = (x: Int, y: Int) => if (y < 8) 10 else 240
    val Some((ar, _, _, _)) = hashOf(Seq(ppm(half, 16, 16)))(0)
    assert(ar.take(4).forall(_ == 0) && ar.drop(4).forall(_ == 255), ar)
  }

  test("frame walk: hand-built streams hash per frame; malformed streams quarantine whole") {
    import graft.functions.ImageFrameHashes
    val pix1 = (x: Int, y: Int) => (x * 31 + y * 17 + 3) % 256
    val pix2 = (x: Int, y: Int) => (x * 13 + y * 41 + 9) % 256
    val f1 = bmp(pix1, 8, 8, topDown = false)
    val f2 = bmp(pix2, 8, 8, topDown = true) // mixed row orders walk fine
    def k12(pix: (Int, Int) => Int): (Long, Long) = {
      val (ar, _) = refHash(pix, 8, 8)
      ((0 until 4).map(j => ar(j).toLong << (8 * j)).reduce(_ | _),
       (0 until 4).map(j => ar(j + 4).toLong << (8 * j)).reduce(_ | _))
    }
    val got = Seq((0, f1 ++ f2), (1, f1 ++ f2.take(f2.length - 1)),
        (2, f1 ++ "trailing garbage".getBytes), (3, f1))
      .toDF("id", "payload")
      .select(col("id"),
        ImageFrameHashes.imageFrameHashes(col("payload"), 64).as("f"))
      .collect().map(r => r.getInt(0) -> Option(r.getSeq[
        org.apache.spark.sql.Row](1))).toMap
    val frames = got(0).get
    assert(frames.size == 2)
    assert((frames(0).getLong(2), frames(0).getLong(3)) == k12(pix1))
    assert((frames(1).getLong(2), frames(1).getLong(3)) == k12(pix2))
    assert(got(1).isEmpty, "truncated second frame must quarantine whole")
    assert(got(2).isEmpty, "trailing garbage must quarantine whole")
    assert(got(3).get.size == 1)
    // over-long stream quarantines
    val many = Array.fill(3)(f1).flatten
    val capped = Seq((0, many)).toDF("id", "payload")
      .select(ImageFrameHashes.imageFrameHashes(col("payload"), 2).as("f"))
      .head()
    assert(capped.isNullAt(0))
  }

  test("videoSharedSegments: island runs at constant offset; an inserted break splits segments") {
    import graft.operators.MultiModal
    val p = (seed: Int) => (x: Int, y: Int) =>
      ((seed * 29 + 13) * (x * 7 + y * 11 + 3)) % 256
    def stream(seeds: Int*) =
      seeds.map(s0 => bmp(p(s0), 8, 8, topDown = false)).reduce(_ ++ _)
    val docs = Seq(
      (0L, stream(1, 2, 3, 4, 5)),
      (1L, stream(9, 2, 3, 4, 8)),  // shares A[1..3] aligned
      (2L, stream(2, 3, 4)),        // A/B's middle run, offset −1
      (3L, stream(1, 2, 99, 3, 4))  // A with an inserted break frame
    ).toDF("doc_id", "payload")
    val got = MultiModal.videoSharedSegments(docs, "doc_id", "payload",
        minLen = 2L, maxDf = 0L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val expected = Set(
      (0L, 1L, 1L, 1L, 3L),  // aligned middle run
      (0L, 2L, 1L, 0L, 3L),  // trimmed re-upload: nonzero offset
      (1L, 2L, 1L, 0L, 3L),
      (0L, 3L, 0L, 0L, 2L),  // before the inserted break
      (0L, 3L, 2L, 3L, 2L),  // after it — offset shifted by +1
      (1L, 3L, 2L, 3L, 2L),  // the break also cuts B∩D to one run
      (2L, 3L, 1L, 3L, 2L))  // single-frame overlaps are filtered
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("videoNearDupPairs: shared-footage pairs, df-capped; SyntheticVideo matches closed form") {
    import graft.functions.SyntheticVideo
    import graft.operators.MultiModal
    // hand fixture: A and B share 2 frames, C shares none. The seed
    // must MULTIPLY the spatial term — aHash is invariant to a
    // constant brightness offset (it thresholds against its own
    // mean), so additive seeds would collapse every frame to one
    // fingerprint
    val p = (seed: Int) => (x: Int, y: Int) =>
      ((seed * 29 + 13) * (x * 7 + y * 11 + 3)) % 256
    def stream(seeds: Int*) =
      seeds.map(s0 => bmp(p(s0), 8, 8, topDown = false))
        .reduce(_ ++ _)
    val docs = Seq(
      (0L, stream(1, 2, 3)), (1L, stream(1, 2, 9)), (2L, stream(4, 5, 6))
    ).toDF("doc_id", "payload")
    val pairs = MultiModal
      .videoNearDupPairs(docs, "doc_id", "payload", minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(pairs.keySet == Set((0L, 1L)), s"got $pairs")
    assert(pairs((0L, 1L)) == 2L)
    // SyntheticVideo: per-frame keys match the closed-form pixels;
    // same-gid variants share exactly nf - 1 frames with the base
    val ids = (0L until 120L).filter(_ % 11 != 7)
    val vd = ids.map(id => (id, SyntheticVideo.build(id, null)))
      .toDF("doc_id", "payload")
    val fh = MultiModal.videoFrameHashes(vd, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    ids.foreach { id =>
      (0 until SyntheticVideo.nFrames(id)).foreach { f =>
        val (ar, _) = refHash(SyntheticVideo.pixel(id, f, _, _), 8, 8)
        val want = (
          (0 until 4).map(j => ar(j).toLong << (8 * j)).reduce(_ | _),
          (0 until 4).map(j => ar(j + 4).toLong << (8 * j)).reduce(_ | _))
        assert(fh((id, f)) == want, s"id=$id f=$f")
      }
    }
    val vPairs = MultiModal
      .videoNearDupPairs(vd, "doc_id", "payload", minShared = 2L,
        maxDf = 20L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // v=0 and each v>0 variant of one gid share nf-1 >= 2 frames
    val planted = ids.filter(_ % 4 == 0).flatMap { base =>
      (1L to 3L).map(v => (base, base + v)).filter(p => ids.contains(p._2))
    }.toSet
    planted.foreach(p => assert(vPairs.contains(p), s"missing $p"))
  }

  test("videoNearDupPairsBanded: catches per-frame drift exact matching misses; superset of uncapped exact") {
    import graft.functions.SyntheticVideo
    import graft.operators.MultiModal
    val base = (seed: Int) => (x: Int, y: Int) =>
      ((seed * 29 + 13) * (x * 7 + y * 11 + 3)) % 256
    // every frame of B drifts one grid cell from A's — a re-encode /
    // brightness-curve edit: zero EXACT frame matches, three near
    // ones. The drift forces cell (3,5) ACROSS the frame's mean (to
    // 0 if it was bright, 255 if dark), so that bit is guaranteed to
    // flip; the mean itself moves by ≤ 4 units, so only
    // mean-adjacent cells can drift along — hamming stays small
    val drift = (seed: Int) => {
      val b = base(seed)
      val cells = for (y <- 0 until 8; x <- 0 until 8) yield b(x, y)
      val mean = cells.map(_.toLong).sum / 64
      val bright = b(3, 5) > mean
      (x: Int, y: Int) =>
        if (x == 3 && y == 5) (if (bright) 0 else 255) else b(x, y)
    }
    def stream(pixes: ((Int, Int) => Int)*) =
      pixes.map(px => bmp(px, 8, 8, topDown = false)).reduce(_ ++ _)
    val docs = Seq(
      (0L, stream(base(1), base(2), base(3))),
      (1L, stream(drift(1), drift(2), drift(3))),
      (2L, stream(base(7), base(8), base(9)))
    ).toDF("doc_id", "payload")
    val exact = MultiModal
      .videoNearDupPairs(docs, "doc_id", "payload", minShared = 2L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!exact.contains((0L, 1L)), "drifted frames must not match exactly")
    val fuzzy = MultiModal
      .videoNearDupPairsBanded(docs, "doc_id", "payload",
        maxHamming = 3, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(fuzzy.keySet.contains((0L, 1L)), s"fuzzy missed drift: $fuzzy")
    assert(fuzzy((0L, 1L)) == 3L, "all three drifted frames should near-match")
    assert(!fuzzy.keySet.exists(p => p._1 == 2L || p._2 == 2L),
      s"unrelated video paired: $fuzzy")
    // contract: fuzzy at any radius ⊇ the UNCAPPED exact pair set
    // (an exactly-equal frame pair is within every radius)
    val ids = (0L until 120L).filter(_ % 11 != 7)
    val vd = ids.map(id => (id, SyntheticVideo.build(id, null)))
      .toDF("doc_id", "payload")
    val exactAll = MultiModal
      .videoNearDupPairs(vd, "doc_id", "payload", minShared = 2L,
        maxDf = 0L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val fuzzyAll = MultiModal
      .videoNearDupPairsBanded(vd, "doc_id", "payload",
        maxHamming = 1, minShared = 2L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exactAll.subsetOf(fuzzyAll),
      s"fuzzy lost exact pairs: ${(exactAll -- fuzzyAll).take(5)}")
  }

  test("phash store: idempotent upsert, frozen serve at the radius, delete forgets") {
    import graft.functions.SyntheticImage
    val root = java.nio.file.Files
      .createTempDirectory("phash_store").toString + "/store"
    val ids1 = (0L until 80L).filter(_ % 11 != 7)
    val ids2 = (80L until 160L).filter(_ % 11 != 7)
    def sigsOf(ids: Seq[Long]) = MultiModal.imagePHashSignatures(
      ids.map(id => (id, SyntheticImage.build(id, null)))
        .toDF("doc_id", "payload"), "doc_id", "payload")
    val n1 = MultiModal.phashStoreUpsert(sigsOf(ids1), root)
    assert(n1 == ids1.size)
    // replayed shard: keyed merge is idempotent
    assert(MultiModal.phashStoreUpsert(sigsOf(ids1), root) == n1)
    val n2 = MultiModal.phashStoreUpsert(sigsOf(ids2), root)
    assert(n2 == ids1.size + ids2.size)
    // frozen serve == the banded pair scan's contract: brute-force
    // reference over (query × store) signatures
    val qIds = ids1.take(20)
    val qSigs = sigsOf(qIds).select("doc_id", "ahash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allSigs = sigsOf(ids1 ++ ids2).select("doc_id", "ahash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      (q, qs) <- qSigs.toSeq; (m, ms) <- allSigs.toSeq
      if java.lang.Long.bitCount(qs ^ ms) <= 2
    } yield (q, m)).toSet
    val got = MultiModal.phashServeNearDups(
        sigsOf(qIds).select("doc_id", "ahash"), root, maxHamming = 2)
      .select("query_id", "match_id").as[(Long, Long)].collect().toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.exists(p => p._1 != p._2), "fixture must plant matches")
    // right-to-be-forgotten: deleted ids stop matching
    val victim = ids2.head
    MultiModal.phashStoreDelete(Seq(victim).toDF("doc_id"), root)
    val after = MultiModal.phashServeNearDups(
        sigsOf(qIds).select("doc_id", "ahash"), root, maxHamming = 2)
      .select("match_id").as[Long].collect().toSet
    assert(!after.contains(victim), "deleted doc still served")

    // ---- band-key-bucketed serve index: pruned == full scan, and a
    // tiny batch opens a strict FILE subset of the index ----
    MultiModal.phashPublishServeIndex(spark, root, maxHamming = 2,
      nBuckets = 64, numFiles = 16)
    val fullServe = MultiModal.phashServeNearDups(
        sigsOf(qIds).select("doc_id", "ahash"), root, maxHamming = 2)
      .as[(Long, Long, Long)].collect().toSet
    val prunedServe = MultiModal.phashServeNearDupsPruned(
        sigsOf(qIds).select("doc_id", "ahash"), root, maxHamming = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(prunedServe == fullServe,
      s"missing=${(fullServe -- prunedServe).take(3)} " +
        s"extra=${(prunedServe -- fullServe).take(3)}")
    val indexFiles = graft.offline.VersionedStore
      .read(spark, root + "/phash_serve_h2").inputFiles.length
    val one = MultiModal.phashServeNearDupsPruned(
      sigsOf(ids1.take(1)).select("doc_id", "ahash"), root,
      maxHamming = 2)
    one.count()
    // one query = 3 band keys → ≤ 3 buckets of 64 → a strict subset
    // of the sorted layout's files (files opened ∝ batch, not table)
    assert(one.inputFiles.length < indexFiles && one.inputFiles.length <= 4,
      s"pruning lost: ${one.inputFiles.length} of $indexFiles files")
    // empty batch: empty result, no crash
    assert(MultiModal.phashServeNearDupsPruned(
      sigsOf(Nil).select("doc_id", "ahash"), root, 2).count() == 0)
  }

  test("SyntheticImage: formats per residue, signature matches closed form") {
    val ids = (0L until 120L).filter(_ % 11 != 7)
    val docs = ids.map(id =>
      (id, SyntheticImage.build(id, null))).toDF("doc_id", "payload")
    val got = docs.select(col("doc_id"),
        ImagePHash.imagePHash(col("payload")).as("ph"))
      .select(col("doc_id"), col("ph.format").as("f"),
        col("ph.arows").as("ar"), col("ph.drows").as("dr"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getSeq[Int](2), r.getSeq[Int](3))).toList
    assert(got.size == ids.size)
    got.foreach { case (id, f, ar, dr) =>
      assert(f == (if (id % 7 == 6) "ppm" else "bmp"), s"id=$id fmt=$f")
      val gid = id / 4
      val w = 8 * (1 + (gid % 3).toInt); val h = 8 * (1 + (gid % 2).toInt)
      val (ea, ed) = refHash(SyntheticImage.pixel(id, _, _), w, h)
      assert(ar == ea.toSeq && dr == ed.toSeq, s"id=$id")
    }
    // quarantine residue with text payload decodes to NULL
    val q = Seq((7L, SyntheticImage.build(7L,
      org.apache.spark.unsafe.types.UTF8String.fromString("plain text"))))
      .toDF("doc_id", "payload")
    assert(MultiModal.imagePHashSignatures(q, "doc_id", "payload").count() == 0)
  }
}
