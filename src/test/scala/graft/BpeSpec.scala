package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE training/encoding held to a naive in-memory reference: the
  * distributed pair-count → argmax → greedy-merge loop must produce
  * the SAME ordered rule list and the same per-word segmentations as
  * a straightforward single-machine implementation on arbitrary
  * corpora — including tie ranks, overlapping runs, and early stop.
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- naive reference ------------------------------------------------
  private def greedy(syms: Vector[String], l: String, r: String)
  : Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, s) =>
      if (acc.nonEmpty && acc.last == l && s == r) acc.init :+ (l + r)
      else acc :+ s
    }

  private def naiveTrain(texts: Seq[String], nMerges: Int,
                         minPairCount: Long)
  : (Seq[(Int, String, String, String, Long)], Map[String, Vector[String]]) = {
    val wordCounts = texts.flatMap(t =>
        Option(t).toSeq.flatMap(_.split(" ").filter(_.nonEmpty)))
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    var st = wordCounts.map { case (w, c) =>
      (w, c, w.map(_.toString).toVector) }.toSeq
    val rules = Seq.newBuilder[(Int, String, String, String, Long)]
    var round = 0
    var stop = false
    while (round < nMerges && !stop) {
      val pairCounts = st.flatMap { case (_, c, syms) =>
        syms.zip(syms.drop(1)).map(p => p -> c)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
        .filter(_._2 >= minPairCount)
      if (pairCounts.isEmpty) stop = true
      else {
        // tie-break in UTF-8 BINARY order (Spark's string comparison
        // is code-point order; Java's UTF-16 compareTo differs on
        // ties involving non-BMP characters)
        implicit val u8: Ordering[String] = (a: String, b: String) =>
          java.util.Arrays.compareUnsigned(
            a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val ((l, r), pc) = pairCounts.toSeq
          .sortBy { case ((l, r), pc) => (-pc, l, r) }.head
        rules += ((round + 1, l, r, l + r, pc))
        st = st.map { case (w, c, syms) => (w, c, greedy(syms, l, r)) }
        round += 1
      }
    }
    (rules.result(), st.map { case (w, _, syms) => w -> syms }.toMap)
  }

  private def trainBoth(texts: Seq[String], nMerges: Int,
                        minPairCount: Long = 2L) = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = Bpe.train(docs, "doc_id", "text", nMerges, minPairCount)
    val gotRules = model.rules.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq.sortBy(_._1)
    val gotPieces = model.wordPieces.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toVector).toMap
    val (wantRules, wantPieces) = naiveTrain(texts, nMerges, minPairCount)
    (model, gotRules, wantRules, gotPieces, wantPieces)
  }

  test("classic corpus: distributed rules and segmentations match the reference") {
    val texts = Seq("low low low lower lower", "newest newest newest",
      "newest widest widest")
    val (_, gotRules, wantRules, gotPieces, wantPieces) =
      trainBoth(texts, nMerges = 8)
    assert(gotRules == wantRules)
    assert(gotPieces == wantPieces)
    assert(gotRules.nonEmpty)
  }

  test("greedy non-overlap: 'aaaa' merges to [aa, aa], 'aaa' to [aa, a]") {
    val (_, _, _, gotPieces, _) =
      trainBoth(Seq("aaaa aaa aaaa"), nMerges = 1, minPairCount = 1L)
    assert(gotPieces("aaaa") == Vector("aa", "aa"))
    assert(gotPieces("aaa") == Vector("aa", "a"))
  }

  test("early stop: training halts when no pair reaches minPairCount") {
    val (model, gotRules, wantRules, _, _) =
      trainBoth(Seq("ab cd ef"), nMerges = 10, minPairCount = 2L)
    assert(gotRules.isEmpty && wantRules.isEmpty)
    assert(model.rules.collect().isEmpty)
  }

  test("random corpora: rules and segmentations match the reference on 8 layouts") {
    val genWord = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val genText = Gen.choose(0, 7).flatMap(n =>
      Gen.listOfN(n, genWord).map(_.mkString(" ")))
    val genCorpus = Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, genText))
    (1 to 8).foreach { round =>
      val texts = genCorpus(Gen.Parameters.default, Seed(round * 7919L)).get
      val (_, gotRules, wantRules, gotPieces, wantPieces) =
        trainBoth(texts, nMerges = 6)
      assert(gotRules == wantRules, s"rules diverged on round $round: $texts")
      assert(gotPieces == wantPieces,
        s"segmentations diverged on round $round: $texts")
    }
  }

  test("encode: trained words use their pieces, OOV words fall back to chars") {
    val train = Seq((1L, "alpha alpha alpha beta")).toDF("doc_id", "text")
    val model = Bpe.train(train, "doc_id", "text", nMerges = 4,
      minPairCount = 2L)
    val corpus = Seq((1L, "alpha zzz"), (2L, null.asInstanceOf[String]),
      (3L, "")).toDF("doc_id", "text")
    val got = Bpe.encode(corpus, "doc_id", "text", model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getSeq[String](3).toVector))
    assert(got.length == 2, "null/empty docs contribute no words")
    val byWord = got.map(x => x._3 -> x._4).toMap
    // "alpha" trained with 3 occurrences → merged pieces; the naive
    // reference says which
    val (_, want) = naiveTrain(Seq("alpha alpha alpha beta"), 4, 2L)
    assert(byWord("alpha") == want("alpha"))
    assert(byWord("zzz") == Vector("z", "z", "z"), "OOV falls back to chars")
  }
}
