package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classify

class ClassifySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def score(docs: org.apache.spark.sql.DataFrame,
                    seed: org.apache.spark.sql.DataFrame,
                    threshold: Double = 0.0)
  : Map[Long, (Long, Double, Boolean)] =
    Classify.nbScore(docs, "doc_id", "text", seed, "doc_id", "lbl",
        threshold = threshold)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("log_odds"),
          r.getAs[Boolean]("keep"))))
      .toMap

  /** The naive in-memory NB reference: same smoothing, same 6dp
    * rounding discipline. */
  private def gold(seedDocs: Seq[(String, Boolean)], text: String,
                   alpha: Double = 1.0): Double = {
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tokens = seedDocs.flatMap { case (t, l) => t.split(" ").map(_ -> l) }
    val vocab = tokens.map(_._1).distinct
    val totP = tokens.count(_._2); val totN = tokens.size - totP
    val nP = seedDocs.count(_._2); val nN = seedDocs.size - nP
    def lr(w: String): Double = {
      val cP = tokens.count(t => t._1 == w && t._2)
      val cN = tokens.count(t => t._1 == w && !t._2)
      if (vocab.contains(w))
        r6(math.log((cP + alpha) / (totP + alpha * vocab.size)) -
           math.log((cN + alpha) / (totN + alpha * vocab.size)))
      else
        r6(math.log(alpha / (totP + alpha * vocab.size)) -
           math.log(alpha / (totN + alpha * vocab.size)))
    }
    val prior = r6(math.log(nP.toDouble / nN))
    // exact decimal sum of 6dp terms == double sum of 6dp terms here
    // (few small terms, well inside double's exact-integer range in
    // micro units)
    prior + text.split(" ").map(lr).sum
  }

  test("nbScore matches a hand-computed NB fit, including OOV and prior terms") {
    val seedTexts = Seq(
      (10L, "good clean prose text", true),
      (11L, "good text prose", true),
      (12L, "spam spam buy now", false))
    val docs = (seedTexts.map { case (id, t, _) => (id, t) } ++ Seq(
      (20L, "good prose"),
      (21L, "buy spam now"),
      (22L, "zzz qqq"))).toDF("doc_id", "text")
    val seed = seedTexts.map { case (id, _, l) => (id, l) }.toDF("doc_id", "lbl")
    val got = score(docs, seed)
    val seedPairs = seedTexts.map { case (_, t, l) => (t, l) }
    for ((id, text) <- Seq(20L -> "good prose", 21L -> "buy spam now",
                           22L -> "zzz qqq")) {
      val expected = gold(seedPairs, text)
      val (n, lo, keep) = got(id)
      assert(n == text.split(" ").length.toLong)
      assert(math.abs(lo - expected) < 1e-9, s"doc $id: $lo vs $expected")
      assert(keep == (lo >= 0.0))
    }
    // the learned model separates the held-out docs the right way
    assert(got(20L)._3 && !got(21L)._3)
    // an all-OOV doc scores prior + 2*oov — dominated by the class
    // with less seed mass (negative here has fewer tokens, so OOV
    // leans positive); just pin the exact value via gold
    assert(math.abs(got(22L)._2 - gold(seedPairs, "zzz qqq")) < 1e-9)
  }

  test("nbScore: threshold moves the keep boundary; null-text docs drop; token multiplicity counts") {
    val docs = Seq((1L, "ham ham ham"), (2L, "spam spam spam"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val seed = Seq((1L, true), (2L, false)).toDF("doc_id", "lbl")
    val base = score(docs, seed)
    assert(!base.contains(3L), "null-text doc must drop")
    assert(base(1L)._2 > 0 && base(2L)._2 < 0)
    // multinomial: tripled tokens triple the word's evidence (minus
    // prior): log_odds(1) - prior == 3 * lr(ham)
    val hi = score(docs, seed, threshold = 1e6)
    assert(hi.values.forall(!_._3), "nothing passes an unreachable threshold")
    intercept[IllegalArgumentException] {
      Classify.nbScore(docs, "doc_id", "text", seed, "doc_id", "lbl",
        threshold = Double.MaxValue)
    }
  }

  // --- fastText-style learned classifier (FtClassify, round 12) -----

  private def ftFixture = {
    val good = "good great fine nice solid clear"
    val bad = "bad awful poor nasty broken murky"
    ((1L to 40L).map { i =>
      if (i % 2 == 0) (i, s"$good extra$i filler$i", true)
      else (i, s"$bad extra$i filler$i", false)
    }).toDF("doc_id", "text", "lbl")
  }

  test("ftClassify: distributed fit == sequential reference bit for bit (emb, w, b, losses)") {
    import graft.operators.{Dsir, FtClassify}
    val seed = ftFixture
    val nB = 256; val dim = 4; val ep = 6
    val got = FtClassify.train(seed, "doc_id", "text", "lbl",
      nBuckets = nB, dim = dim, epochs = ep, lrMicro = 2000000L)
    // reference rows: the same hashed features, collected
    val rows = Dsir.hashedNgramCounts(
        seed.select(col("doc_id"), col("text"),
          col("lbl").cast("boolean").as("y")),
        "doc_id", "text", nB, Seq("y" -> col("y")))
      .collect()
      .groupBy(r => (r.getLong(0), r.getBoolean(1)))
      .toSeq.sortBy(_._1._1)
      .map { case ((id, y), rs) =>
        (id, y, rs.map(r => (r.getLong(2), r.getLong(3))).toSeq)
      }
    val want = FtClassify.trainReference(rows, nB, dim, ep,
      lrMicro = 2000000L, seedSalt = 42L)
    assert(got.bMicro === want.bMicro)
    assert(got.w.toSeq === want.w.toSeq)
    assert(got.emb.toSeq === want.emb.toSeq)
    assert(got.lossMicroByEpoch === want.lossMicroByEpoch)
  }

  test("ftClassify: loss decreases and the frozen scorer separates the fixture") {
    import graft.operators.FtClassify
    val seed = ftFixture
    val model = FtClassify.train(seed, "doc_id", "text", "lbl",
      nBuckets = 256, dim = 4, epochs = 12)
    assert(model.lossMicroByEpoch.last < model.lossMicroByEpoch.head,
      s"loss must decrease: ${model.lossMicroByEpoch}")
    val scored = FtClassify.scoreFrozen(seed, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val acc = (1L to 40L).count(i => scored(i) == (i % 2 == 0)) / 40.0
    assert(acc >= 0.9, s"train-set accuracy $acc (model should separate " +
      s"two disjoint vocabularies)")
    // unseen docs from the two vocabularies classify by their words
    val fresh = Seq((100L, "good great fine unseen1"),
      (101L, "bad awful poor unseen2")).toDF("doc_id", "text")
    val f = FtClassify.scoreFrozen(fresh, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(f(100L) && !f(101L), s"generalization: $f")
  }

  test("ftClassify: persisted model round-trips bit-equal; stored scorer == in-memory scorer") {
    import graft.operators.FtClassify
    val seed = ftFixture
    val model = FtClassify.train(seed, "doc_id", "text", "lbl",
      nBuckets = 128, dim = 4, epochs = 8)
    val root = java.nio.file.Files
      .createTempDirectory("ft_store").toString + "/ft"
    FtClassify.saveModel(spark, model, root)
    val loaded = FtClassify.modelFromStore(spark, root)
    assert(loaded.nBuckets === model.nBuckets)
    assert(loaded.dim === model.dim)
    assert(loaded.bMicro === model.bMicro)
    assert(loaded.w.toSeq === model.w.toSeq)
    assert(loaded.emb.toSeq === model.emb.toSeq)
    val a = FtClassify.scoreFrozen(seed, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = FtClassify.scoreFrozen(seed, "doc_id", "text", loaded)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a === b)
  }

  test("ftClassify refreshMc: drift gate exercised both ways; keep is sound (refit of unchanged seed == stored); retrain == full refit bit for bit") {
    import graft.operators.FtClassify
    val root = java.nio.file.Files
      .createTempDirectory("ft_refresh").toString + "/ft"
    val seed = ftMcFixture
    val m0 = FtClassify.initRefreshStoreMc(seed, "doc_id", "text",
      "lang", root, nBuckets = 256, dim = 4, epochs = 6,
      lrMicro = 2000000L)
    // fresh store: drift exactly 0, refresh keeps, model untouched
    assert(FtClassify.seedDriftMc(spark, root) == 0.0)
    val keep = FtClassify.refreshMc(spark, root, maxDrift = 0.1)
    assert(!keep.retrained && keep.drift == 0.0)
    assert(keep.model.emb.toSeq === m0.emb.toSeq)
    // re-upserting the SAME docs is idempotent: drift stays 0
    FtClassify.upsertSeedDocsMc(seed, "doc_id", "text", "lang", root)
    assert(FtClassify.seedDriftMc(spark, root) == 0.0)
    // keep is SOUND: a refit of the unchanged stored seed reproduces
    // the stored model bit for bit (deterministic trainMc)
    val refit = FtClassify.trainMc(seed, "doc_id", "text", "lang",
      nBuckets = 256, dim = 4, epochs = 6, lrMicro = 2000000L)
    assert(refit.emb.toSeq === m0.emb.toSeq)
    assert(refit.w.toSeq === m0.w.toSeq)
    assert(refit.bMicro.toSeq === m0.bMicro.toSeq)
    // a differently-distributed shard (a NEW class) moves the drift
    val shard = (100L to 120L)
      .map(i => (i, s"delta dune drum desert dagger x$i", "dd"))
      .toDF("doc_id", "text", "lang")
    FtClassify.upsertSeedDocsMc(shard, "doc_id", "text", "lang", root)
    val drift = FtClassify.seedDriftMc(spark, root)
    assert(drift > 0.1, s"new-class shard must move the mass: $drift")
    // gate both ways on the SAME store state
    val stillKeep = FtClassify.refreshMc(spark, root, maxDrift = 10.0)
    assert(!stillKeep.retrained && stillKeep.drift == drift)
    val ref = FtClassify.refreshMc(spark, root, maxDrift = 0.1)
    assert(ref.retrained && ref.drift == drift)
    assert(ref.model.labels.toSeq == Seq("aa", "bb", "cc", "dd"))
    // the retrained model == a direct fit of the union, bit for bit
    val want = FtClassify.trainMc(seed.union(shard), "doc_id", "text",
      "lang", nBuckets = 256, dim = 4, epochs = 6, lrMicro = 2000000L)
    assert(ref.model.emb.toSeq === want.emb.toSeq)
    assert(ref.model.w.toSeq === want.w.toSeq)
    assert(ref.model.bMicro.toSeq === want.bMicro.toSeq)
    // store-served scorer == the refreshed in-memory model, and the
    // drift gate re-zeroes after retraining
    assert(FtClassify.seedDriftMc(spark, root) == 0.0)
    val served = FtClassify.modelMcFromStore(spark, root)
    assert(served.emb.toSeq === ref.model.emb.toSeq)
  }

  test("calibrationReport: rank-decile bins, ties share a bin, rates and ranges exact") {
    import graft.operators.Classify
    // 20 docs, scores 1..20, label = score > 10 (perfectly ordered):
    // deciles of 2; bins 0-4 all negative, 5-9 all positive
    val perfect = (1 to 20).map(i => (i.toDouble, i > 10))
      .toDF("score", "lbl")
    val rep = Classify.calibrationReport(perfect, "score", "lbl", 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(rep.keySet === (0L to 9L).toSet)
    assert(rep.values.forall(_._1 === 2L), s"2 docs per decile: $rep")
    (0L to 4L).foreach(b => assert(rep(b)._3 === 0.0, s"bin $b: $rep"))
    (5L to 9L).foreach(b => assert(rep(b)._3 === 1.0, s"bin $b: $rep"))
    assert(rep(0L)._4 === 1.0 && rep(0L)._5 === 2.0)
    assert(rep(9L)._4 === 19.0 && rep(9L)._5 === 20.0)
    // tied scores share a bin (rank from strictly-smaller counts)
    val tied = (Seq.fill(15)((5.0, true)) ++ Seq.fill(5)((1.0, false)))
      .toDF("score", "lbl")
    val rep2 = Classify.calibrationReport(tied, "score", "lbl", 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    assert(rep2 === Map(0L -> ((5L, 0.0)), 2L -> ((15L, 1.0))),
      s"ties collapse to the rank bin of their first member: $rep2")
    // single-row edge: one bin, no division by zero
    val one = Seq((7.0, true)).toDF("score", "lbl")
    val rep3 = Classify.calibrationReport(one, "score", "lbl", 10)
      .collect()
    assert(rep3.length === 1 && rep3.head.getLong(0) === 0L)
  }

  // --- multiclass (softmax) fastText variant — the langid shape ----

  private def ftMcFixture = {
    val vocab = Map("aa" -> "alpha apple arrow anchor attic",
      "bb" -> "berry basket bridge bottle bramble",
      "cc" -> "cedar candle copper canyon cricket")
    ((1L to 45L).map { i =>
      val l = Seq("aa", "bb", "cc")((i % 3).toInt)
      (i, s"${vocab(l)} extra$i filler$i", l)
    }).toDF("doc_id", "text", "lang")
  }

  test("ftClassify multiclass: distributed softmax fit == sequential reference bit for bit") {
    import graft.operators.{Dsir, FtClassify}
    val seed = ftMcFixture
    val nB = 256; val dim = 4; val ep = 6
    val got = FtClassify.trainMc(seed, "doc_id", "text", "lang",
      nBuckets = nB, dim = dim, epochs = ep, lrMicro = 2000000L)
    val labels = Array("aa", "bb", "cc")
    val idx = labels.zipWithIndex.toMap
    val rows = Dsir.hashedNgramCounts(
        seed.select(col("doc_id"), col("text"), col("lang").as("y")),
        "doc_id", "text", nB, Seq("y" -> col("y")))
      .collect()
      .groupBy(r => (r.getLong(0), r.getString(1)))
      .toSeq.sortBy(_._1._1)
      .map { case ((id, y), rs) =>
        (id, idx(y), rs.map(r => (r.getLong(2), r.getLong(3))).toSeq)
      }
    val want = FtClassify.trainMcReference(rows, labels, nB, dim, ep,
      lrMicro = 2000000L, seedSalt = 42L)
    assert(got.labels.toSeq === want.labels.toSeq)
    assert(got.bMicro.toSeq === want.bMicro.toSeq)
    assert(got.w.toSeq === want.w.toSeq)
    assert(got.emb.toSeq === want.emb.toSeq)
    assert(got.lossMicroByEpoch === want.lossMicroByEpoch)
  }

  test("ftClassify multiclass: loss decreases; frozen one-pass scorer recovers all three classes") {
    import graft.operators.FtClassify
    val seed = ftMcFixture
    val model = FtClassify.trainMc(seed, "doc_id", "text", "lang",
      nBuckets = 256, dim = 4, epochs = 15)
    assert(model.lossMicroByEpoch.last < model.lossMicroByEpoch.head,
      s"loss must decrease: ${model.lossMicroByEpoch}")
    val scored = FtClassify.scoreFrozenMc(seed, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    val acc = (1L to 45L).count(i =>
      scored(i) == Seq("aa", "bb", "cc")((i % 3).toInt)) / 45.0
    assert(acc >= 0.9, s"train accuracy $acc over 3 disjoint vocabularies")
    // unseen docs classify by their vocabulary; null text drops
    val fresh = Seq((100L, "alpha apple unseen"),
      (101L, "berry basket unseen"), (102L, "cedar candle unseen"),
      (103L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val f = FtClassify.scoreFrozenMc(fresh, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(f === Map(100L -> "aa", 101L -> "bb", 102L -> "cc"))
  }
}
