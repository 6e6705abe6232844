package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Unigram

/** Unigram (SentencePiece-family) tokenizer held to TWO references:
  * a sequential Viterbi/hard-EM implementation (the distributed
  * trainer must match it exactly — the BpeSpec contract), and a
  * brute-force segmentation ENUMERATOR that scores every path and
  * sorts on (cost, reversed-breakpoint key) — the total order the
  * q_unigram_encode oracle uses, so the DP-tie-break ≡ path-order
  * theorem the oracle rests on is checked here on random inputs, not
  * just argued. */
class UnigramSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Inf = Long.MaxValue / 4

  // ---- sequential references -----------------------------------------

  private def refCandidates(wc: Seq[(String, Long)],
                            maxL: Int): Map[String, Long] = {
    val m = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for ((w, c) <- wc; i <- 0 until w.length;
         l <- 1 to maxL if i + l <= w.length)
      m(w.substring(i, i + l)) += c
    m.toMap
  }

  private def refSeed(wc: Seq[(String, Long)], maxL: Int,
                      topK: Int): Map[String, Long] = {
    val cand = refCandidates(wc, maxL)
    val top = cand.toSeq.sortBy { case (p, c) => (-c, p) }.take(topK)
    (top ++ cand.filter(_._1.length == 1)).toMap
  }

  private def refIntCosts(v: Map[String, Long]): Map[String, Long] = {
    val tot = v.values.sum
    v.map { case (p, c) => p -> (tot * 1000000L) / c }
  }

  private def refLogCosts(v: Map[String, Long]): Map[String, Long] = {
    val tot = v.values.sum.toDouble
    v.map { case (p, c) => p -> math.round(-1e6 * math.log(c / tot)) }
  }

  /** Forward DP, ties to the smallest piece start — the operator's
    * declared rule. */
  private def refViterbi(w: String, costs: Map[String, Long], maxL: Int)
  : Option[(List[String], Long)] = {
    val n = w.length
    val dp = Array.fill(n + 1)((Inf, -1)); dp(0) = (0L, -1)
    for (j <- 1 to n) {
      var best = (Inf, -1)
      for (i <- math.max(0, j - maxL) until j) {
        val c = dp(i)._1 + costs.getOrElse(w.substring(i, j), Inf)
        if (c < best._1) best = (c, i)
      }
      dp(j) = best
    }
    if (dp(n)._1 >= Inf) None
    else {
      var j = n
      val ps = scala.collection.mutable.ListBuffer.empty[String]
      while (j > 0) { val p = dp(j)._2; w.substring(p, j) +=: ps; j = p }
      Some((ps.toList, dp(n)._1))
    }
  }

  /** Brute force: every segmentation whose pieces are all in the
    * vocab, minimal (cost, then reversed piece-start sequence) — the
    * ORACLE's total order. */
  private def refBrute(w: String, costs: Map[String, Long], maxL: Int)
  : Option[(List[String], Long)] = {
    def paths(pos: Int): List[List[Int]] =
      if (pos == w.length) List(Nil)
      else (1 to math.min(maxL, w.length - pos)).toList.flatMap { l =>
        if (costs.contains(w.substring(pos, pos + l)))
          paths(pos + l).map(pos :: _)
        else Nil
      }
    val all = paths(0)
    if (all.isEmpty) None
    else {
      def cost(starts: List[Int]): Long = {
        val bounds = starts :+ w.length
        bounds.sliding(2).map { case List(a, b) =>
          costs(w.substring(a, b)) }.sum
      }
      implicit val seqOrd: Ordering[List[Int]] =
        Ordering.Implicits.seqOrdering[List, Int]
      val best = all.map(st => (cost(st), st.reverse, st))
        .minBy(t => (t._1, t._2))
      val bounds = best._3 :+ w.length
      Some((bounds.sliding(2).map { case List(a, b) =>
        w.substring(a, b) }.toList, best._1))
    }
  }

  private def refTrain(wc: Seq[(String, Long)], vocabSize: Int,
                       maxL: Int, rounds: Int,
                       seedK: Int): Map[String, Long] = {
    var vocab = refSeed(wc, maxL, seedK)
    val singles = vocab.keys.filter(_.length == 1).toSet
    for (_ <- 1 to rounds) {
      val costs = refLogCosts(vocab)
      val usage = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      for ((w, c) <- wc; (ps, _) <- refViterbi(w, costs, maxL);
           p <- ps) usage(p) += c
      val kept = usage.toSeq.sortBy { case (p, c) => (-c, p) }
        .take(vocabSize).toMap
      vocab = kept ++ singles.filterNot(kept.contains)
        .map(s => s -> math.max(usage(s), 1L))
    }
    vocab
  }

  private def sparkEncode(words: Seq[String], costs: Map[String, Long],
                          maxL: Int): Map[String, Option[(List[String], Long)]] =
    Unigram.encodeWords(words.toDF("word"), costs, maxL)
      .collect().map { r =>
        val w = r.getAs[String]("word")
        val ps = Option(r.getAs[scala.collection.Seq[String]]("pieces"))
        w -> ps.map(p => (p.toList, r.getAs[Long]("cost_micro")))
      }.toMap

  // ---- specs -----------------------------------------------------------

  test("encodeWords: hand fixture with a cost tie — smallest start (longest last piece) wins") {
    // vocab: ab=5, cd=5, abc=7, d=3, a=9, b=9, c=9
    // "abcd": [ab cd] = 10, [abc d] = 10 — a true tie; the reversed-
    // breakpoint order prefers last start 2 ([ab cd]) over 3 ([abc d])
    val costs = Map("ab" -> 5L, "cd" -> 5L, "abc" -> 7L, "d" -> 3L,
      "a" -> 9L, "b" -> 9L, "c" -> 9L)
    val got = sparkEncode(Seq("abcd"), costs, 3)("abcd")
    assert(got === Some((List("ab", "cd"), 10L)))
    assert(refViterbi("abcd", costs, 3) === got)
    assert(refBrute("abcd", costs, 3) === got)
  }

  test("encodeWords: unreachable word yields NULL pieces, reachable neighbors unaffected") {
    val costs = Map("a" -> 1L, "b" -> 1L) // no 'x'
    val got = sparkEncode(Seq("ab", "axb"), costs, 2)
    assert(got("ab") === Some((List("a", "b"), 2L)))
    assert(got("axb") === None)
  }

  test("encodeWords: round-trips every corpus word; DP == reference == brute force") {
    val docs = Tables.documents(spark, TestSpark.sfDir).limit(120)
    val wc = graft.operators.Bpe.corpusWordCounts(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val costs = refIntCosts(refSeed(wc, 4, 64))
    val words = wc.map(_._1)
    val got = sparkEncode(words, costs, 4)
    words.foreach { w =>
      val g = got(w)
      assert(g === refViterbi(w, costs, 4), s"word $w")
      assert(g === refBrute(w, costs, 4), s"brute mismatch on $w")
      assert(g.get._1.mkString("") === w, s"round trip of $w")
    }
  }

  test("random vocab/cost layouts: DP == brute force on 12 layouts (the oracle's total order)") {
    val rnd = new scala.util.Random(41)
    (1 to 12).foreach { layout =>
      val alpha = "abc"
      val words = (1 to 12).map(_ =>
        (1 to (2 + rnd.nextInt(6))).map(_ => alpha(rnd.nextInt(3))).mkString)
      val wc = words.groupBy(identity).map { case (w, g) =>
        w -> g.size.toLong }.toSeq
      // random subset of candidates + all singles; SMALL costs so
      // ties are common — the hostile case for the tie-break theorem
      val cand = refCandidates(wc, 3)
      val vocab = cand.filter { case (p, _) =>
        p.length == 1 || rnd.nextBoolean() }
      val costs = vocab.map { case (p, _) => p -> (1L + rnd.nextInt(4)) }
      val got = sparkEncode(words.distinct, costs, 3)
      words.distinct.foreach { w =>
        assert(got(w) === refBrute(w, costs, 3),
          s"layout $layout word $w costs $costs")
        assert(got(w) === refViterbi(w, costs, 3),
          s"layout $layout word $w (ref) costs $costs")
      }
    }
  }

  test("seedVocab / integerCosts match the sequential reference") {
    val wc = Seq(("table", 4L), ("tab", 2L), ("able", 3L), ("be", 5L))
    val got = Unigram.integerCosts(
        Unigram.seedVocab(wc.toDF("word", "cnt"), 3, 10))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val vocab = refSeed(wc, 3, 10)
    val costs = refIntCosts(vocab)
    assert(got.keySet === vocab.keySet)
    got.foreach { case (p, (c, cm)) =>
      assert(c === vocab(p) && cm === costs(p), s"piece $p") }
  }

  test("trainFromCounts matches the sequential hard-EM reference (vocab, counts, costs)") {
    val wc = Seq(("spark", 6L), ("sparse", 3L), ("parse", 4L),
      ("park", 5L), ("are", 7L), ("spa", 2L))
    val model = Unigram.trainFromCounts(wc.toDF("word", "cnt"),
      vocabSize = 12, maxPieceLen = 3, rounds = 3, seedTopK = 24)
    val got = model.vocab.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ref = refTrain(wc, 12, 3, 3, 24)
    val refCosts = refLogCosts(ref)
    assert(got.keySet === ref.keySet,
      s"vocab drift: got ${got.keySet}, ref ${ref.keySet}")
    got.foreach { case (p, (c, cm)) =>
      assert(c === ref(p), s"count of $p")
      assert(cm === refCosts(p), s"cost of $p")
    }
    // coverage: every single character of the corpus survives
    val chars = wc.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(got.keySet))
    // and the model's segmentations round-trip
    model.wordPieces.collect().foreach { r =>
      assert(r.getAs[Seq[String]]("pieces").mkString("") ===
        r.getString(0))
    }
  }

  test("train is deterministic and prunes: tiny vocabSize keeps singles alive") {
    val docs = Seq((1L, "aa ab aa ba bb aa"), (2L, "ab aa bb aa"))
      .toDF("doc_id", "text")
    val m1 = Unigram.train(docs, "doc_id", "text", vocabSize = 3,
      maxPieceLen = 2, rounds = 2)
    val m2 = Unigram.train(docs, "doc_id", "text", vocabSize = 3,
      maxPieceLen = 2, rounds = 2)
    val v1 = m1.vocab.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val v2 = m2.vocab.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(v1 === v2, "same input must train the same model")
    val pieces = v1.map(_._1)
    assert(Set("a", "b").subsetOf(pieces), "singles must survive pruning")
  }

  test("trainFromStore: retrains from the shared BPE word-count store == direct train on the union") {
    val root = java.nio.file.Files
      .createTempDirectory("unistore").toString + "/vs"
    val a = Seq((1L, "spark park are spark"), (2L, "parse spa are"))
      .toDF("doc_id", "text")
    val b = Seq((10L, "sparse spark are park")).toDF("doc_id", "text")
    graft.operators.Bpe.buildVocabStore(a, "doc_id", "text", root,
      nMerges = 5)
    assert(graft.operators.Bpe.upsertVocabCounts(b, "doc_id", "text",
      root, "s1"))
    val fromStore = Unigram.trainFromStore(spark, root, vocabSize = 10,
        maxPieceLen = 3, rounds = 2)
      .vocab.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = Unigram.train(a.union(b), "doc_id", "text",
        vocabSize = 10, maxPieceLen = 3, rounds = 2)
      .vocab.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromStore === direct,
      "store-fed training must equal direct training on the union")
  }

  test("refreshUnigram persists the vocab; modelFromStore serves it bit-equal, tracking retraction") {
    val root = java.nio.file.Files
      .createTempDirectory("unirefresh").toString + "/tok"
    val base = Seq((1L, "spark park are spark"), (2L, "parse spa are"))
      .toDF("doc_id", "text")
    val shard = Seq((10L, "sparse spark zzz zzz")).toDF("doc_id", "text")
    graft.operators.Bpe.buildVocabStore(base, "doc_id", "text", root,
      nMerges = 5, minPairCount = 1L)
    assert(graft.operators.Bpe.upsertVocabCounts(shard, "doc_id", "text",
      root, "s1"))
    val trained = Unigram.refreshUnigram(spark, root, vocabSize = 10,
      maxPieceLen = 3, rounds = 2)
    val (served, l) = Unigram.modelFromStore(spark, root)
    assert(l === 3)
    assert(served === Unigram.collectCosts(trained.vocab),
      "stored artifact must be bit-equal to the fit that wrote it")
    // a retraction changes the counts; the NEXT refresh tracks it
    assert(graft.operators.Bpe.retractVocabCounts(shard, "doc_id",
      "text", root, "s1"))
    val after = Unigram.refreshUnigram(spark, root, vocabSize = 10,
      maxPieceLen = 3, rounds = 2)
    val direct = Unigram.train(base, "doc_id", "text", vocabSize = 10,
      maxPieceLen = 3, rounds = 2)
    assert(Unigram.collectCosts(after.vocab) ===
      Unigram.collectCosts(direct.vocab),
      "post-retraction refresh must fit the never-ingested corpus")
    assert(Unigram.modelFromStore(spark, root)._1 ===
      Unigram.collectCosts(after.vocab))
  }

  test("encodeDocsSampled: alpha=0 == exact Viterbi; seeded draws deterministic; both tie paths occur") {
    // "abcd" has TWO equal-cost segmentations ([ab cd] and [abc d])
    // under this vocab — the clean fixture for sampling: alpha 0 must
    // always take the Viterbi tie-break, alpha > 0 must visit both
    val costs = Map("ab" -> 5L, "cd" -> 5L, "abc" -> 7L, "d" -> 3L,
      "a" -> 9L, "b" -> 9L, "c" -> 9L)
    val docs = (1L to 200L).map(i => (i, "abcd abcd")).toDF("doc_id", "text")
    val exact = Unigram.encodeDocs(docs, "doc_id", "text", costs, 3)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val zero = Unigram.encodeDocsSampled(docs, "doc_id", "text", costs,
        3, alphaMicro = 0L, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(zero === exact, "alpha = 0 must be bit-equal to Viterbi")
    def sample(seed: Long) = Unigram.encodeDocsSampled(docs, "doc_id",
        "text", costs, 3, alphaMicro = 3L, seed = seed)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val s1 = sample(7L)
    assert(s1 === sample(7L), "same seed must replay exactly")
    assert(s1 !== sample(8L), "different seeds must differ somewhere")
    // every sampled segmentation is a valid minimum-ish path over the
    // vocab and round-trips the characters
    s1.values.foreach { enc =>
      assert(enc.replace(" ", "") === "abcdabcd")
      enc.split(" ").foreach(p => assert(costs.contains(p), s"piece $p"))
    }
    // with 400 occurrences and a true cost tie, both paths must occur
    val variants = s1.values.flatMap(_.split(" abcd| (?=ab)").toSeq).toSet
    val all = s1.values.mkString(" ")
    assert(all.contains("ab cd") && all.contains("abc d"),
      s"both tie paths should appear across 400 draws: $variants")
    // and the two occurrences WITHIN a doc draw independently: some
    // doc must mix the two variants
    assert(s1.values.exists(e =>
      e.matches(".*ab cd.*abc d.*") || e.matches(".*abc d.*ab cd.*")),
      "per-occurrence salts must decorrelate draws inside one doc")
  }

  test("UnigramSample: perturbed objective SUBTRACTS the Gumbel draw; path frequencies track softmax(-cost/alpha)") {
    import graft.functions.UnigramSample
    val n = 4000
    // (1) direction: perturb-and-MAP for softmax(-cost/alpha) is
    // argmin(cost - alpha*Gumbel), so E[perturbed objective] ≈
    // cost - 0.577·alpha. A sign inversion (adding the draw) lands
    // ABOVE cost — the round-11 bug this spec pins down.
    // objective = cost - alpha*(G - γ): mean ≈ cost (centered), and
    // SUBTRACTING the right-skewed Gumbel leaves a LEFT-skewed
    // objective — median sits ≈ 0.21·alpha ABOVE the mean. The
    // round-11 sign bug (adding the draw) flips the skew: median
    // below mean. Sharp, deterministic, and exactly the sign.
    val one = spark.range(n).select(lit("a").as("w"), col("id").as("salt"))
    val cs = one.select(UnigramSample.segment(col("w"), col("salt"),
        Map("a" -> 1000000L), 1, alphaMicro = 1000000L)
        .getField("cost_micro").as("c"))
    val mean = cs.agg(avg("c")).head().getDouble(0)
    val median = cs.stat.approxQuantile("c", Array(0.5), 0.0001)(0)
    assert(math.abs(mean - 1000000.0) < 100000.0,
      s"centered draw: mean ≈ cost (got $mean)")
    assert(median - mean > 100000.0,
      s"subtracted Gumbel leaves a left-skewed objective " +
        s"(median ≈ mean + 0.21·alpha; got mean=$mean median=$median)")
    // (2) two-path word "ab": costs 1.0M ([ab]) vs 1.5M ([a b]) at
    // alpha 0.5M → softmax gives P([ab]) = e^0/(e^0+e^-1) ≈ 0.731;
    // per-arc centered noise lands ≈ 0.696 (simulated), the declared
    // approximation (exact softmax needs one draw per PATH, which is
    // not projection-shaped). Draws are seeded → deterministic.
    val costs = Map("ab" -> 1000000L, "a" -> 750000L, "b" -> 750000L)
    val two = spark.range(n).select(lit("ab").as("w"),
      (col("id") + 90000).as("salt"))
    val pAb = two.select(concat_ws(" ",
        UnigramSample.segment(col("w"), col("salt"), costs, 2,
          alphaMicro = 500000L).getField("pieces")).as("enc"))
      .filter(col("enc") === "ab").count().toDouble / n
    assert(math.abs(pAb - 0.731) < 0.08,
      s"P([ab]) should approximate softmax 0.731, got $pAb")
  }

  test("encodeDocs: one projection reassembles word-level encodes; n_tokens consistent") {
    val docs = Seq((1L, Some("aa ab ba")), (2L, Some("")),
      (3L, Some("b")), (4L, None))
      .toDF("doc_id", "text")
    val costs = Map("a" -> 3L, "b" -> 3L, "aa" -> 4L, "ab" -> 4L)
    val out = Unigram.encodeDocs(docs, "doc_id", "text", costs, 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(out(1L) === ((4L, "aa ab b a")))
    assert(out(2L) === ((0L, "")))
    assert(out(3L) === ((1L, "b")))
    assert(out(4L) === ((0L, "")), "null text encodes empty, not null")
  }
}
