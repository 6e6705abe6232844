package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AudioPHash, SyntheticWav}
import graft.operators.MultiModal

/** Audio energy-hash family (round 14, the image family's A/V twin):
  * the PCM decoder is checked against HAND-BUILT WAV bytes and a
  * test-local reference hash, channel-count invariance (stereo with
  * duplicated samples hashes identically to mono), chunk-walk
  * robustness (unknown chunks skipped), quarantine NULLs, and the
  * banded pair scan against brute force. */
class AudioPHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- test-local reference: frame energies from a sample fn ------
  private def refHash(s: Int => Int, n: Int): Array[Int] = {
    val e = Array.fill(64)(0L)
    for (t <- 0 until n) e((t.toLong * 64 / n).toInt) += math.abs(s(t))
    val mean = e.sum / 64
    val rows = Array.fill(8)(0)
    for (f <- 0 until 64 if e(f) > mean) rows(f / 8) |= 1 << (f % 8)
    rows
  }

  // ---- hand byte-builder (independent of SyntheticWav.build) ------
  private def wav(s: Int => Int, n: Int, channels: Int,
                  rate: Int = 8000, extraChunk: Boolean = false,
                  fmtTag: Int = 1, bits: Int = 16): Array[Byte] = {
    val extra = if (extraChunk) 12 else 0 // "LIST" + len 4 + 4 bytes
    val dataLen = n * channels * 2
    val out = new Array[Byte](44 + extra + dataLen)
    def le16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def le32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def tag(o: Int, t: String): Unit =
      t.getBytes("US-ASCII").zipWithIndex.foreach {
        case (c, j) => out(o + j) = c
      }
    tag(0, "RIFF"); le32(4, out.length - 8); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, fmtTag); le16(22, channels)
    le32(24, rate); le32(28, rate * channels * 2)
    le16(32, channels * 2); le16(34, bits)
    var o = 36
    if (extraChunk) { tag(o, "LIST"); le32(o + 4, 4); o += 12 }
    tag(o, "data"); le32(o + 4, dataLen)
    for (t <- 0 until n; c <- 0 until channels)
      le16(o + 8 + (t * channels + c) * 2, s(t) & 0xFFFF)
    out
  }

  private def hashOf(payloads: Seq[Array[Byte]])
  : Map[Int, Option[(Int, Int, Seq[Int])]] =
    payloads.zipWithIndex.map { case (p, i) => (i, p) }
      .toDF("id", "payload")
      .select(col("id"), AudioPHash.audioPHash(col("payload")).as("ph"))
      .collect().map { r =>
        r.getInt(0) -> Option(r.getStruct(1)).map { s =>
          (s.getInt(2), s.getInt(3), s.getSeq[Int](4))
        }
      }.toMap

  test("decoder matches the reference hash; stereo and chunk layout invariant") {
    val n = 200
    val s = (t: Int) => ((t * 37 + 11) % 3000) - 1500
    val want = refHash(s, n).toSeq
    val got = hashOf(Seq(
      wav(s, n, channels = 1),
      wav(s, n, channels = 2),           // duplicated samples: mix == s
      wav(s, n, channels = 1, extraChunk = true),
      wav(s, n, channels = 1, rate = 44100)))
    got.foreach { case (i, h) =>
      val Some((ch, ns, rows)) = h
      assert(ns == n, s"payload $i n_samples")
      assert(rows == want, s"payload $i signature")
      assert(ch == (if (i == 1) 2 else 1))
    }
  }

  test("quarantine: truncation, non-PCM, 8-bit, too short, non-audio → NULL") {
    val s = (t: Int) => (t % 100) - 50
    val good = wav(s, 200, 1)
    val truncated = good.take(good.length - 3)
    val float32 = wav(s, 200, 1, fmtTag = 3)
    val pcm8 = wav(s, 200, 1, bits = 8)
    val short = wav(s, 63, 1) // < 64 mixed samples
    val text = "RIFF through the WAVEs of plain text".getBytes
    val got = hashOf(Seq(good, truncated, float32, pcm8, short, text))
    assert(got(0).isDefined)
    for (i <- 1 to 5) assert(got(i).isEmpty, s"payload $i not quarantined")
  }

  test("loud-splice variant pairs at radius 2; contrasting waveform does not") {
    val base = (t: Int) => if ((t / 25) % 2 == 0) 1000 else -100
    val spliced = (t: Int) => if (t / 25 == 3) base(t) * 8 else base(t)
    val opposite = (t: Int) => if ((t / 25) % 2 == 0) -100 else 1000
    val docs = Seq(
      (0L, wav(base, 1600, 1)),
      (1L, wav(spliced, 1600, 1)),
      (2L, wav(opposite, 1600, 1))
    ).toDF("doc_id", "payload")
    val pairs = MultiModal
      .audioNearDupPairs(docs, "doc_id", "payload", maxHamming = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"planted splice pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      s"opposite waveform paired: $pairs")
  }

  test("banded pairs == brute-force hamming pairs; SyntheticWav matches closed form") {
    val ids = (0L until 240L).filter(_ % 11 != 7)
    val docs = ids.map(id =>
      (id, SyntheticWav.build(id, null))).toDF("doc_id", "payload")
    val sigDf = MultiModal
      .audioPHashSignatures(docs, "doc_id", "payload")
    val sigs = sigDf.select("doc_id", "ahash").as[(Long, Long)]
      .collect().toMap
    assert(sigs.size == ids.size) // every non-quarantine id decodes
    // signature row bytes match the closed-form reference
    sigDf.select("doc_id", "n_samples", "arows")
      .collect().foreach { r =>
        val id = r.getLong(0); val n = r.getLong(1).toInt
        val gid = id / 4
        assert(n == 64 * (4 + (gid % 5).toInt), s"id=$id n_samples")
        assert(r.getSeq[Int](2) ==
          refHash(SyntheticWav.sample(id, _), n).toSeq, s"id=$id")
      }
    val expected = (for {
      a <- ids; b <- ids if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 2
    } yield (a, b)).toSet
    val got = MultiModal
      .audioNearDupPairs(docs, "doc_id", "payload", maxHamming = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    assert(expected.nonEmpty) // the construction plants work
  }
}
