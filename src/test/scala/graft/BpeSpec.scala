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
    // split by CODE POINT, not UTF-16 char — Spark's substring/length
    // are code-point indexed, so a non-BMP character must be ONE
    // initial symbol here too, not its two surrogate halves
    def codePointSyms(w: String): Vector[String] =
      w.codePoints().toArray.toVector
        .map(cp => new String(Character.toChars(cp)))
    var st = wordCounts.map { case (w, c) =>
      (w, c, codePointSyms(w)) }.toSeq
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

  // ---- batched trainer: must be EXACTLY the sequential algorithm ------

  private def batchedBoth(texts: Seq[String], nMerges: Int,
                          minPairCount: Long = 2L, maxBatch: Int = 128) = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (model, rounds) = Bpe.trainBatched(docs, "doc_id", "text",
      nMerges, minPairCount, maxBatch)
    val gotRules = model.rules.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq.sortBy(_._1)
    val gotPieces = model.wordPieces.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toVector).toMap
    val (wantRules, wantPieces) = naiveTrain(texts, nMerges, minPairCount)
    (rounds, gotRules, wantRules, gotPieces, wantPieces)
  }

  test("batched: classic corpus matches the sequential reference in fewer rounds") {
    val texts = Seq("low low low lower lower", "newest newest newest",
      "newest widest widest")
    val (rounds, gotRules, wantRules, gotPieces, wantPieces) =
      batchedBoth(texts, nMerges = 8)
    assert(gotRules == wantRules)
    assert(gotPieces == wantPieces)
    assert(rounds <= gotRules.size, "one round can never emit < 1 rule")
  }

  test("batched: greedy non-overlap runs survive batching") {
    val (_, gotRules, wantRules, gotPieces, wantPieces) =
      batchedBoth(Seq("aaaa aaa aaaa", "abab abab cdcd"), nMerges = 6,
        minPairCount = 1L)
    assert(gotRules == wantRules)
    assert(gotPieces == wantPieces)
  }

  test("batched: maxBatch=1 degenerates to sequential") {
    val texts = Seq("low low low lower lower", "newest newest newest")
    val (rounds, gotRules, wantRules, _, _) =
      batchedBoth(texts, nMerges = 5, maxBatch = 1)
    assert(gotRules == wantRules)
    assert(rounds == gotRules.size)
  }

  test("batched: random corpora match the reference on 10 layouts") {
    // small alphabet + repeated words force conflicts, ties, and
    // created-pair bound hits — the paths where batching could diverge
    val genWord = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val genText = Gen.choose(0, 9).flatMap(n =>
      Gen.listOfN(n, genWord).map(_.mkString(" ")))
    val genCorpus = Gen.choose(2, 7).flatMap(n => Gen.listOfN(n, genText))
    (1 to 10).foreach { round =>
      val texts = genCorpus(Gen.Parameters.default, Seed(round * 104729L)).get
      val (_, gotRules, wantRules, gotPieces, wantPieces) =
        batchedBoth(texts, nMerges = 8, minPairCount = 1L)
      assert(gotRules == wantRules, s"rules diverged on round $round: $texts")
      assert(gotPieces == wantPieces,
        s"segmentations diverged on round $round: $texts")
    }
  }

  test("batched: wide disjoint vocabulary actually batches (rounds << merges)") {
    // 26 independent two-letter words with distinct letters and
    // distinct counts: all top pairs are mutually disjoint, so the
    // exact-batch rule should take many per round
    val words = ('a' to 'z').grouped(2).zipWithIndex.map { case (cs, i) =>
      Seq.fill(100 - i)(cs.mkString).mkString(" ") }.toSeq
    val (rounds, gotRules, wantRules, _, _) =
      batchedBoth(words, nMerges = 13, minPairCount = 1L)
    assert(gotRules == wantRules)
    assert(rounds < gotRules.size,
      s"expected batching on disjoint vocab, got $rounds rounds for ${gotRules.size} merges")
  }

  test("batched: merged-string collisions with existing symbols stay exact") {
    // words that are pure runs ('aaaa') and near-runs ('abab') drive
    // merges whose merged string equals an ALREADY-EXISTING symbol
    // (e.g. (aa,aa)→'aaaa' while 'aaaa' was built via (aaa,a)) — the
    // case where applying a merge INCREASES a pre-existing pair's
    // count. The collision guard must keep the batch exact.
    val genWord = Gen.frequency(
      (3, Gen.choose(1, 12).map("a" * _)),
      (2, Gen.choose(1, 6).map("ab" * _)),
      (1, Gen.choose(1, 8).map("b" * _)))
    val genText = Gen.choose(1, 9).flatMap(n =>
      Gen.listOfN(n, genWord).map(_.mkString(" ")))
    val genCorpus = Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, genText))
    (1 to 10).foreach { round =>
      val texts = genCorpus(Gen.Parameters.default, Seed(round * 15485863L)).get
      val (_, gotRules, wantRules, gotPieces, wantPieces) =
        batchedBoth(texts, nMerges = 12, minPairCount = 1L)
      assert(gotRules == wantRules, s"rules diverged on round $round: $texts")
      assert(gotPieces == wantPieces,
        s"segmentations diverged on round $round: $texts")
    }
  }

  test("batched: merged-string collisions stay exact at minPairCount=2") {
    // the collision guard's live-symbol set must come from the
    // UNFILTERED pair table: with minPairCount=2 a live symbol whose
    // every adjacency has count 1 drops out of the thresholded pairs,
    // and a guard built from them would miss the collision (letting a
    // post-merge count exceed the created-pair ceiling by up to
    // minPairCount-1). Same run-heavy generator as the
    // minPairCount=1 collision test, which masked exactly this.
    val genWord = Gen.frequency(
      (3, Gen.choose(1, 12).map("a" * _)),
      (2, Gen.choose(1, 6).map("ab" * _)),
      (1, Gen.choose(1, 8).map("b" * _)))
    val genText = Gen.choose(1, 9).flatMap(n =>
      Gen.listOfN(n, genWord).map(_.mkString(" ")))
    val genCorpus = Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, genText))
    (1 to 10).foreach { round =>
      val texts = genCorpus(Gen.Parameters.default, Seed(round * 49207L)).get
      val (_, gotRules, wantRules, gotPieces, wantPieces) =
        batchedBoth(texts, nMerges = 12, minPairCount = 2L)
      assert(gotRules == wantRules, s"rules diverged on round $round: $texts")
      assert(gotPieces == wantPieces,
        s"segmentations diverged on round $round: $texts")
    }
  }

  test("batched: same-round rules sharing a merged string stay exact") {
    // two rules accepted in ONE round can in principle produce the
    // SAME merged string (e.g. (a,bc) and (ab,c) both -> 'abc'); their
    // created-pair occurrences then pool, so the per-rule max ceiling
    // under-counts and a later same-round pick could diverge from the
    // sequential argmax. The trainer now ends the round at such a
    // duplicate. This generator piles up words whose segmentations
    // put the same underlying strings behind different symbol
    // boundaries (shared substrings + runs + boundary-divergent
    // prefixes) and runs large batches so any reachable duplicate
    // lands inside one round.
    val base = Seq("abc", "ab", "bc", "a", "b", "c", "aab", "abb",
      "bcc", "aabc", "abcc", "abab", "bcbc", "aabbcc", "cab", "cba")
    val genWord = Gen.frequency(
      (4, Gen.oneOf(base)),
      (2, Gen.choose(2, 8).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))),
      (1, Gen.choose(1, 6).map("abc" * _)))
    val genText = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, genWord).map(_.mkString(" ")))
    val genCorpus = Gen.choose(3, 7).flatMap(n => Gen.listOfN(n, genText))
    (1 to 10).foreach { round =>
      val texts = genCorpus(Gen.Parameters.default, Seed(round * 86969L)).get
      val (_, gotRules, wantRules, gotPieces, wantPieces) =
        batchedBoth(texts, nMerges = 18, minPairCount = 1L, maxBatch = 256)
      assert(gotRules == wantRules, s"rules diverged on round $round: $texts")
      assert(gotPieces == wantPieces,
        s"segmentations diverged on round $round: $texts")
    }
  }

  test("batched: decay-tracked conflicts match the reference (chain-heavy corpora)") {
    // two-letter alphabet with long words maximizes x==b / y==a
    // interactions, reverse pairs (ab vs ba), and tainted-rule
    // chains — the decay-simulation paths
    val genWord = Gen.choose(2, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b")).map(_.mkString))
    val genText = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, genWord).map(_.mkString(" ")))
    val genCorpus = Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, genText))
    (1 to 12).foreach { round =>
      val texts = genCorpus(Gen.Parameters.default, Seed(round * 7207L)).get
      val (_, gotRules, wantRules, gotPieces, wantPieces) =
        batchedBoth(texts, nMerges = 15, minPairCount = 1L, maxBatch = 8)
      assert(gotRules == wantRules, s"rules diverged on round $round: $texts")
      assert(gotPieces == wantPieces,
        s"segmentations diverged on round $round: $texts")
    }
  }

  test("batched: deep merges over a 3-letter alphabet (uncertain-freeze paths)") {
    // longer rule chains + larger batches reach the states where
    // candidates turn UNCERTAIN and must stay frozen (their cur is
    // no longer exact once a tainted rule touched them)
    val genWord = Gen.choose(2, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val genText = Gen.choose(1, 7).flatMap(n =>
      Gen.listOfN(n, genWord).map(_.mkString(" ")))
    val genCorpus = Gen.choose(3, 6).flatMap(n => Gen.listOfN(n, genText))
    (1 to 8).foreach { round =>
      val texts = genCorpus(Gen.Parameters.default, Seed(round * 33391L)).get
      val (_, gotRules, wantRules, gotPieces, wantPieces) =
        batchedBoth(texts, nMerges = 20, minPairCount = 1L, maxBatch = 256)
      assert(gotRules == wantRules, s"rules diverged on round $round: $texts")
      assert(gotPieces == wantPieces,
        s"segmentations diverged on round $round: $texts")
    }
  }

  test("batched: recorded pair_counts equal the sequential (decayed) counts") {
    // a corpus engineered so the second-best pair decays when the
    // best merges: "xa ab" — merging (a,b) consumes occurrences of
    // (x,a)'s neighbor pattern "x a b"
    val texts = Seq(
      "xab xab xab xab xab",  // (a,b) and (x,a) both frequent, chained
      "xa xa xa",              // keeps (x,a) alive off the chain
      "qq qq")                 // filler
    val (_, gotRules, wantRules, _, _) =
      batchedBoth(texts, nMerges = 6, minPairCount = 1L)
    assert(gotRules == wantRules,
      s"decayed pair_count mismatch: got $gotRules want $wantRules")
  }

  // ---- persisted vocabulary store (incremental maintenance) -----------

  test("vocab store: N shard upserts equal batch counts over the union; replays no-op") {
    val root = java.nio.file.Files
      .createTempDirectory("bpevocab").toString + "/tok"
    val base = Seq("low low low lower", "newest newest widest")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Bpe.buildVocabStore(base, "doc_id", "text", root, nMerges = 10,
      minPairCount = 1L)
    val shard1 = Seq((10L, "low lowest lowest")).toDF("doc_id", "text")
    val shard2 = Seq((11L, "widest widest newest low")).toDF("doc_id", "text")
    assert(Bpe.upsertVocabCounts(shard1, "doc_id", "text", root, "s1"))
    assert(Bpe.upsertVocabCounts(shard2, "doc_id", "text", root, "s2"))
    // replayed shard must no-op (ledger idempotence)
    assert(!Bpe.upsertVocabCounts(shard1, "doc_id", "text", root, "s1"))
    val got = graft.offline.VersionedStore
      .read(spark, Bpe.vocabCountsTable(root))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Bpe.corpusWordCounts(
        base.unionByName(shard1).unionByName(shard2), "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"stored counts diverge from batch:\n$got\n$want")
  }

  test("vocab store retraction: counts equal never-ingested; both trainers fit the remaining corpus") {
    val root = java.nio.file.Files
      .createTempDirectory("bpevretract").toString + "/tok"
    val base = Seq("low low low lower", "newest newest widest")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Bpe.buildVocabStore(base, "doc_id", "text", root, nMerges = 10,
      minPairCount = 1L)
    val shard = Seq((10L, "low lowest zzz zzz")).toDF("doc_id", "text")
    assert(Bpe.upsertVocabCounts(shard, "doc_id", "text", root, "s1"))
    assert(Bpe.retractVocabCounts(shard, "doc_id", "text", root, "s1"))
    val got = graft.offline.VersionedStore
      .read(spark, Bpe.vocabCountsTable(root))
      .filter(org.apache.spark.sql.functions.col("cnt") > 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Bpe.corpusWordCounts(base, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, "retracted store must equal never-ingested")
    assert(!got.contains("zzz"), "shard-only words must be deleted")
    // the shared counts serve BOTH tokenizer trainers post-retraction
    val uniStore = graft.operators.Unigram.trainFromStore(spark, root,
        vocabSize = 12, maxPieceLen = 3, rounds = 2)
      .vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val uniDirect = graft.operators.Unigram.train(base, "doc_id", "text",
        vocabSize = 12, maxPieceLen = 3, rounds = 2)
      .vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uniStore === uniDirect)
    assert(!Bpe.retractVocabCounts(shard, "doc_id", "text", root, "s1"))
    assert(Bpe.upsertVocabCounts(shard, "doc_id", "text", root, "s1"),
      "re-ingest after retraction (generation cycle)")
  }

  test("vocab store: refresh keeps below the drift threshold, retrains above it") {
    val root = java.nio.file.Files
      .createTempDirectory("bpevocab2").toString + "/tok"
    val base = (1 to 50).map(i => (i.toLong, "alpha beta gamma alpha"))
      .toDF("doc_id", "text")
    Bpe.buildVocabStore(base, "doc_id", "text", root, nMerges = 8,
      minPairCount = 1L)
    assert(Bpe.vocabDrift(spark, root) == 0.0)
    val r0 = Bpe.refreshVocab(spark, root, maxDrift = 0.1)
    assert(!r0.retrained && r0.drift == 0.0)
    val rulesV0 = graft.offline.VersionedStore
      .latestVersion(spark, Bpe.vocabRulesTable(root))

    // a small shard: drift stays under threshold → keep
    Bpe.upsertVocabCounts(Seq((100L, "alpha beta"))
      .toDF("doc_id", "text"), "doc_id", "text", root, "small")
    val r1 = Bpe.refreshVocab(spark, root, maxDrift = 0.1)
    assert(!r1.retrained && r1.drift > 0.0 && r1.drift < 0.1,
      s"small shard drift: ${r1.drift}")
    assert(graft.offline.VersionedStore
      .latestVersion(spark, Bpe.vocabRulesTable(root)) == rulesV0,
      "rules must not be rewritten on a keep decision")

    // a vocabulary-shifting shard: drift exceeds → retrain, and the
    // retrained rules equal batch training over the stored counts
    val big = (1 to 120).map(i => (200L + i, "zetavolt zetavolt omegaflux"))
      .toDF("doc_id", "text")
    Bpe.upsertVocabCounts(big, "doc_id", "text", root, "big")
    val r2 = Bpe.refreshVocab(spark, root, maxDrift = 0.1)
    assert(r2.retrained && r2.drift > 0.1, s"big shard drift: ${r2.drift}")
    assert(Bpe.vocabDrift(spark, root) == 0.0,
      "drift must reset to zero after retraining")
    val gotRules = Bpe.vocabModel(spark, root).rules.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
      .sortBy(_._1)
    val wantRules = Bpe.trainFromCounts(
        graft.offline.VersionedStore.read(spark,
          Bpe.vocabCountsTable(root)), nMerges = 8, minPairCount = 1L)
      .rules.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
      .sortBy(_._1)
    assert(gotRules == wantRules)
    // the refreshed model serves through the standard encoder
    val enc = Bpe.encodeAny(Seq((1L, "zetavolt unseenword"))
        .toDF("doc_id", "text"), "doc_id", "text",
        Bpe.vocabModel(spark, root))
      .collect().map(r => r.getString(2) -> r.getSeq[String](3)).toMap
    assert(enc.contains("zetavolt") && enc.contains("unseenword"))
  }

  test("non-BMP characters are single code-point symbols on both sides") {
    // U+1D552 (𝕒) is a surrogate pair in UTF-16; both the distributed
    // splitter (Spark substring, code-point indexed) and the naive
    // reference must treat it as ONE symbol
    val astral = new String(Character.toChars(0x1D552))
    val texts = Seq(s"${astral}b${astral}b ${astral}b ${astral}b x${astral}")
    val (_, gotRules, wantRules, gotPieces, wantPieces) =
      trainBoth(texts, nMerges = 3, minPairCount = 2L)
    assert(gotRules == wantRules)
    assert(gotPieces == wantPieces)
    assert(gotRules.exists(r => r._2 == astral || r._3 == astral),
      "the astral char should participate in a merge as one symbol")
    val (_, bRules, bWant, bPieces, bWantP) =
      batchedBoth(texts, nMerges = 3, minPairCount = 2L)
    assert(bRules == bWant && bPieces == bWantP)
  }

  test("encodeWord replays training exactly: every trained word re-segments to its cache") {
    // the strongest property: treating EVERY training word as unseen
    // must reproduce the training segmentation byte-for-byte —
    // including on run/collision-prone corpora
    val corpora = Seq(
      Seq("low low low lower lower", "newest newest newest",
        "newest widest widest"),
      Seq("aaaa aaa aaaa aa a", "abab abab ababab", "bbb bb ab"),
      Seq("xab xab xab xab xab", "xa xa xa", "qq qq"))
    corpora.foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val model = Bpe.train(docs, "doc_id", "text", nMerges = 10,
        minPairCount = 1L)
      val ruleSeq = model.rules.select("rank", "left", "right").collect()
        .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2)))
        .toIndexedSeq
      val cache = model.wordPieces.collect()
        .map(r => r.getString(0) -> r.getSeq[String](2).toVector).toMap
      cache.foreach { case (w, want) =>
        assert(Bpe.encodeWord(w, ruleSeq) == want,
          s"word '$w': replay ${Bpe.encodeWord(w, ruleSeq)} != cache $want")
      }
    }
  }

  test("encodeAny: unseen words segment by the rules, seen words by the cache") {
    val train = Seq((1L, "low low low lower lower newest newest"))
      .toDF("doc_id", "text")
    val model = Bpe.train(train, "doc_id", "text", nMerges = 8,
      minPairCount = 1L)
    val ruleSeq = model.rules.select("rank", "left", "right").collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2)))
      .toIndexedSeq
    // "lowest" is UNSEEN but shares structure with trained words —
    // the rules should merge its "low"/"est"-ish prefixes, where the
    // chars-only fallback of plain encode() cannot
    val corpus = Seq((1L, "low lowest zzz")).toDF("doc_id", "text")
    val got = Bpe.encodeAny(corpus, "doc_id", "text", model).collect()
      .map(r => r.getString(2) -> r.getSeq[String](3).toVector).toMap
    val cache = model.wordPieces.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toVector).toMap
    assert(got("low") == cache("low"), "seen word must use the cache")
    assert(got("lowest") == Bpe.encodeWord("lowest", ruleSeq))
    assert(got("lowest").length < "lowest".length,
      s"rules should merge something in 'lowest', got ${got("lowest")}")
    assert(got("zzz") == Vector("z", "z", "z"),
      "no applicable rules → code-point symbols")
    // fully-seen corpora: encodeAny == encode row-for-row
    val seenOnly = Seq((9L, "low lower newest")).toDF("doc_id", "text")
    val a = Bpe.encodeAny(seenOnly, "doc_id", "text", model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getSeq[String](3).toVector)).toSet
    val e = Bpe.encode(seenOnly, "doc_id", "text", model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getSeq[String](3).toVector)).toSet
    assert(a == e)
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
