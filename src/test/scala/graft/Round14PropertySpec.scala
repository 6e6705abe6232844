package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AudioPHash, ImagePHash}
import graft.operators.{FeatureEng, MultiModal}

/** Property tests for the round-14 primitives on ARBITRARY inputs
  * (deterministic seeds): container invariance of the pixel decoder,
  * channel invariance of the PCM decoder, the pigeonhole recall of
  * the shared row-group banding under random bit flips, and the
  * budget-partition algebra of the epoch scheduler.
  */
class Round14PropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val p = Gen.Parameters.default

  // minimal independent byte builders (mirror ImagePHashSpec's, kept
  // local so a builder bug cannot hide a decoder bug across files)
  private def bmp(pix: Array[Int], w: Int, h: Int,
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
      val v = pix(y * w + x).toByte
      out(o) = v; out(o + 1) = v; out(o + 2) = v
    }
    out
  }

  private def ppm(pix: Array[Int], w: Int, h: Int): Array[Byte] = {
    val hdr = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](hdr.length + w * h * 3)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    for (i <- 0 until w * h) {
      val v = pix(i).toByte
      out(hdr.length + 3 * i) = v
      out(hdr.length + 3 * i + 1) = v
      out(hdr.length + 3 * i + 2) = v
    }
    out
  }

  test("ImagePHash: BMP bottom-up == BMP top-down == PPM for random pixel matrices") {
    val genDims = for {
      w <- Gen.choose(8, 40); h <- Gen.choose(8, 40)
    } yield (w, h)
    for (round <- 1 to 6) {
      val (w, h) = genDims(p, Seed(round * 101L)).get
      val pix = Gen.listOfN(w * h, Gen.choose(0, 255))(
        p, Seed(round * 211L)).get.toArray
      val rows = Seq(
        (0, bmp(pix, w, h, topDown = false)),
        (1, bmp(pix, w, h, topDown = true)),
        (2, ppm(pix, w, h)))
      val sigs = rows.toDF("id", "payload")
        .select(col("id"),
          ImagePHash.imagePHash(col("payload")).as("ph"))
        .collect()
        .map(r => (r.getStruct(1).getLong(4), r.getStruct(1).getLong(6)))
        .toSet
      assert(sigs.size == 1,
        s"round $round ${w}x$h: containers disagree: $sigs")
    }
  }

  test("AudioPHash: mono == stereo == quad for random sample streams; n_samples exact") {
    for (round <- 1 to 6) {
      val n = 64 + round * 37
      val samples = Gen.listOfN(n, Gen.choose(-32768, 32767))(
        p, Seed(round * 313L)).get.toArray
      def wav(channels: Int): Array[Byte] = {
        val dataLen = n * channels * 2
        val out = new Array[Byte](44 + dataLen)
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
        tag(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, channels)
        le32(24, 8000); le32(28, 8000 * channels * 2)
        le16(32, channels * 2); le16(34, 16)
        tag(36, "data"); le32(40, dataLen)
        for (t <- 0 until n; c <- 0 until channels)
          le16(44 + (t * channels + c) * 2, samples(t) & 0xFFFF)
        out
      }
      val got = Seq((1, wav(1)), (2, wav(2)), (4, wav(4)))
        .toDF("ch", "payload")
        .select(col("ch"), AudioPHash.audioPHash(col("payload")).as("ph"))
        .collect()
        .map(r => (r.getStruct(1).getInt(3), r.getStruct(1).getLong(5)))
        .toSet
      // duplicated-channel mixes are exact → identical (n, ahash)
      assert(got.size == 1, s"round $round: channel layouts disagree")
      assert(got.head._1 == n)
    }
  }

  test("rowBandedPairs: pigeonhole recall 1.0 for random signatures under <= maxHamming flips") {
    val rnd = new scala.util.Random(4242)
    for (maxHamming <- Seq(1, 2, 3, 7)) {
      // random base signatures plus planted <= maxHamming-flip twins
      val base = (0 until 60).map(i => (i.toLong * 2, rnd.nextLong()))
      val twins = base.take(30).map { case (id, sig) =>
        val flips = rnd.nextInt(maxHamming + 1)
        val flipped = (0 until flips).foldLeft(sig)((s, _) =>
          s ^ (1L << rnd.nextInt(64)))
        (id + 1, flipped)
      }
      val all = base ++ twins
      val sigs = all.map { case (id, sig) =>
        val rows = (0 until 8).map(j => ((sig >>> (8 * j)) & 0xFF).toInt)
        (id, rows.toArray, sig)
      }.toDF("doc_id", "arows", "ahash")
      val got = MultiModal.rowBandedPairs(sigs, maxHamming)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val want = (for {
        (a, sa) <- all; (b, sb) <- all if a < b
        if java.lang.Long.bitCount(sa ^ sb) <= maxHamming
      } yield (a, b)).toSet
      assert(got == want, s"h=$maxHamming: " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("epochSchedule: scheduled tokens partition the budget for random corpora") {
    val genDocs = Gen.listOfN(40, for {
      src <- Gen.oneOf("a", "b", "c")
      n <- Gen.choose(1, 30)
    } yield (src, n))
    for (round <- 1 to 5) {
      val rows = genDocs(p, Seed(round * 431L)).get.zipWithIndex
        .map { case ((src, n), i) =>
          (i.toLong, Seq.fill(n)("w").mkString(" "), src)
        }
      val docs = rows.toDF("doc_id", "text", "source")
      val total = rows.map(_._2.split(" ").length.toLong).sum
      val budget = 1L + (round * 7919L) % (total * 3)
      val sched = FeatureEng.epochSchedule(docs, "doc_id", "text",
          "source", budget, maxEpochs = 3).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3)))
      val used = sched.map(_._3).sum
      // never over budget; under only by less than the next doc the
      // straddling prefix excluded (or because the recipe exhausted
      // maxEpochs passes over the corpus)
      assert(used <= budget, s"round $round: $used > $budget")
      if (used < budget && sched.nonEmpty) {
        val maxEpochsHit = total * 3 == used
        val slack = budget - used
        val maxDoc = rows.map(_._2.split(" ").length.toLong).max
        assert(maxEpochsHit || slack <= maxDoc + 1,
          s"round $round: slack $slack exceeds any one doc")
      }
      // a doc appears at most once per epoch
      val dup = sched.groupBy(s => (s._1, s._4)).filter(_._2.size > 1)
      assert(dup.isEmpty, s"round $round: duplicated (doc, epoch) $dup")
    }
  }
}
