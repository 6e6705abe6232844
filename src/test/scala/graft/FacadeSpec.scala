package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fns
import graft.operators.{LinkGraph, RangeJoin, Sketch}

/** The round-10/11 Graft facade surface: every sketch-store / join-
  * planning / link-graph method delegates correctly (the thin-wrapper
  * contract — equality with the operator call, or the operator's own
  * invariant), so users never need `graft.operators.*` imports for
  * the newest families.
  */
class FacadeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)

  private def shingleStream: DataFrame =
    docs.select(col("source"),
      explode(Fns.shingles(col("text"), 3)).as("shingle"))

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/store"

  // --- in-plan sketches ------------------------------------------------

  test("distinctEstimate / sliceOverlap / quantileEstimate delegate") {
    val d = Graft.distinctEstimate(shingleStream, "shingle", Seq("source"))
    assert(d.columns.contains("hll_estimate") && d.count() > 0)
    val o = Graft.sliceOverlap(shingleStream, "shingle", "source")
    assert(o.columns.toSeq === Seq("slice_a", "slice_b", "jaccard_est"),
      "production default must be the audit-free path")
    assert(o.count() > 0)
    val q = Graft.quantileEstimate(
      docs.select(col("source"), col("doc_id"),
        length(col("text")).cast("double").as("v")),
      "v", "doc_id", Seq("source"))
    assert(q.columns.contains("p50_sample") && q.count() > 0)
  }

  test("bloomTakedown and bloomBitset/bloomProbe agree (fast family)") {
    val d = docs.select(col("doc_id"), col("doc_id").cast("string").as("k"))
    val drops = d.filter(col("doc_id") % 7 === 0).select("k")
    val joined = Graft.bloomTakedown(d, "k", drops, "k", mBits = 512)
      .select(col("doc_id"), col("bloom_hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val bits = Graft.bloomBitset(drops, "k", mBits = 512)
    val probed = d.select(col("doc_id"),
        Graft.bloomProbe(bits, col("k"), mBits = 512).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(probed === joined)
    assert(joined.values.count(identity) >= drops.count())
  }

  // --- persisted stores ------------------------------------------------

  test("sketchStore facade: build/upsert/read + takedown/rebuild") {
    val root = tmpRoot("fc-hll")
    val all = shingleStream.localCheckpoint(false)
    Graft.sketchStoreBuild(
      all.filter(length(col("shingle")) % 2 === 0), "shingle",
      Seq("source"), root)
    assert(Graft.sketchStoreUpsert(
      all.filter(length(col("shingle")) % 2 === 1), "shingle",
      Seq("source"), root, "s1"))
    val served = Graft.sketchStoreDistinct(spark, root, Seq("source"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("hll_estimate")).toMap
    val direct = Sketch.mergeEstimate(
        Sketch.hllSketchTable(all, "shingle", Seq("source")), Seq("source"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("hll_estimate")).toMap
    assert(served === direct)
    val victim = served.keys.min
    assert(Graft.sketchTakedown(Seq(victim).toDF("source"), root,
      "hll", "t1"))
    assert(!Graft.sketchStoreDistinct(spark, root, Seq("source"))
      .collect().map(_.getAs[String]("source")).contains(victim))
    Graft.sketchStoreRebuild(all.filter(col("source") =!= victim),
      "shingle", Seq("source"), root, "t1")
    assert(Graft.sketchStoreDistinct(spark, root, Seq("source"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("hll_estimate")).toMap === served - victim)
  }

  test("kmvStore / quantileStore facade round trips") {
    val all = shingleStream.localCheckpoint(false)
    val kroot = tmpRoot("fc-kmv")
    Graft.kmvStoreBuild(all.filter(length(col("shingle")) % 2 === 0),
      "shingle", "source", kroot, k = 32)
    assert(Graft.kmvStoreUpsert(
      all.filter(length(col("shingle")) % 2 === 1), "shingle", "source",
      kroot, "s1"))
    val fromStore = Graft.kmvStoreOverlap(spark, kroot)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(2)).toMap
    val direct = Graft.sliceOverlap(all, "shingle", "source", k = 32)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(2)).toMap
    assert(fromStore === direct)
    val qroot = tmpRoot("fc-qs")
    val vals = docs.select(col("source"), col("doc_id"),
      length(col("text")).cast("double").as("v")).localCheckpoint(false)
    Graft.quantileStoreBuild(vals.filter(col("doc_id") % 2 === 0),
      "v", "doc_id", "source", qroot, k = 64)
    assert(Graft.quantileStoreUpsert(vals.filter(col("doc_id") % 2 === 1),
      "v", "doc_id", "source", qroot, "s1"))
    val served = Graft.quantileStoreRead(spark, qroot)
    assert(served.columns.contains("p95_sample") && served.count() > 0)
  }

  test("cmStore facade: build/upsert/estimates/retract") {
    val root = tmpRoot("fc-cm")
    val keys = Tables.orders(spark, sf)
      .select(col("o_custkey").cast("string").as("k")).localCheckpoint(false)
    val base = keys.filter(xxhash64(col("k")) % 2 === 0)
    val shard = keys.filter(xxhash64(col("k")) % 2 =!= 0)
    Graft.cmStoreBuild(base, "k", root, depth = 3, width = 512)
    assert(Graft.cmStoreUpsert(shard, "k", root, "s1"))
    val probes = keys.distinct().select(col("k").as("probe_key"))
      .limit(20).localCheckpoint(false)
    val est = Graft.cmStoreEstimates(spark, root, probes, "probe_key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = keys.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (k, e) =>
      assert(e >= exact.getOrElse(k, 0L), "CM must never undercount") }
    assert(Graft.cmStoreRetract(shard, "k", root, "s1"))
    val back = Graft.cmStoreEstimates(spark, root, probes, "probe_key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val baseExact = base.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    back.foreach { case (k, e) =>
      assert(e >= baseExact.getOrElse(k, 0L)) }
  }

  // --- join planning / joinAuto ---------------------------------------

  private def plainJoin(a: DataFrame, aKey: String, b: DataFrame,
                        bKey: String): Set[Seq[Any]] =
    a.join(b, a(aKey) === b(bKey), "inner")
      .select((a.columns ++ b.columns).map(col): _*)
      .collect().map(_.toSeq).toSet

  test("joinAuto dispatches all four strategies, each == the plain join") {
    val big = spark.range(2000)
      .select(col("id").as("ak"), (col("id") % 7).as("av"))
      .localCheckpoint(false)
    val big2 = spark.range(1500)
      .select((col("id") % 500).as("bk"), col("id").as("bv"))
      .localCheckpoint(false)
    val small = spark.range(40)
      .select(col("id").as("bk"), (col("id") + 100).as("bv"))
      .localCheckpoint(false)
    val small2 = spark.range(30)
      .select(col("id").as("ak"), (col("id") + 7).as("av"))
      .localCheckpoint(false)
    // one key holds 50% of rows → the provable hot bound trips
    val hot = spark.range(2000)
      .select(when(col("id") % 2 === 0, lit(3L)).otherwise(col("id"))
        .as("ak"), col("id").as("av"))
      .localCheckpoint(false)

    // broadcast_a: a is the small side
    val ba = Graft.joinAuto(small2, "ak", big2, "bk", broadcastRows = 100)
    assert(ba.strategy === "broadcast_a")
    assert(ba.df.collect().map(_.toSeq).toSet ===
      plainJoin(small2, "ak", big2, "bk"))
    // broadcast_b: b smaller than a
    val bb = Graft.joinAuto(big, "ak", small, "bk", broadcastRows = 100)
    assert(bb.strategy === "broadcast_b")
    assert(bb.df.collect().map(_.toSeq).toSet ===
      plainJoin(big, "ak", small, "bk"))
    // shuffle: both sides over the broadcast budget, no provable skew
    val sh = Graft.joinAuto(big, "ak", big2, "bk", broadcastRows = 10)
    assert(sh.strategy === "shuffle")
    assert(sh.df.collect().map(_.toSeq).toSet ===
      plainJoin(big, "ak", big2, "bk"))
    // shuffle_salted: the hot side trips the skew rule
    val ss = Graft.joinAuto(hot, "ak", big2, "bk", broadcastRows = 10,
      skewFactor = 4)
    assert(ss.strategy === "shuffle_salted")
    assert(ss.df.collect().map(_.toSeq).toSet ===
      plainJoin(hot, "ak", big2, "bk"))
    // the pre-flight estimate is one-sided for every scenario
    assert(ss.joinSizeEst >= ss.df.count())
    assert(sh.joinSizeEst >= sh.df.count())
  }

  test("joinAuto salts the RIGHT side when b is the skewed frame") {
    val flat = spark.range(1200)
      .select(col("id").as("ak"), (col("id") % 5).as("av"))
      .localCheckpoint(false)
    val hotB = spark.range(1200)
      .select(when(col("id") % 2 === 0, lit(9L)).otherwise(col("id"))
        .as("bk"), col("id").as("bv"))
      .localCheckpoint(false)
    val r = Graft.joinAuto(flat, "ak", hotB, "bk", broadcastRows = 10,
      skewFactor = 4)
    assert(r.strategy === "shuffle_salted")
    assert(r.df.collect().map(_.toSeq).toSet ===
      plainJoin(flat, "ak", hotB, "bk"))
    // output column order stays a-then-b even though b was salted
    assert(r.df.columns.toSeq === Seq("ak", "av", "bk", "bv"))
  }

  test("joinAuto on an empty side broadcasts it (n_rows 0, not NULL)") {
    val a = spark.range(100).select(col("id").as("ak"))
      .filter(col("ak") < 0) // empty
    val b = spark.range(50).select(col("id").as("bk"))
    val r = Graft.joinAuto(a, "ak", b, "bk")
    assert(r.strategy === "broadcast_a")
    assert(r.df.count() === 0L)
  }

  test("joinAutoFromStores: store-fed decision == inline-sketch decision, zero corpus scans at plan time") {
    val big = spark.range(2000)
      .select(col("id").as("ak"), (col("id") % 7).as("av"))
      .localCheckpoint(false)
    val small = spark.range(40)
      .select(col("id").as("bk"), (col("id") + 100).as("bv"))
      .localCheckpoint(false)
    val hot = spark.range(2000)
      .select(when(col("id") % 2 === 0, lit(3L)).otherwise(col("id"))
        .as("ak"), col("id").as("av"))
      .localCheckpoint(false)
    def root() = java.nio.file.Files
      .createTempDirectory("cm_joinauto").toString + "/cm"
    // defaults match joinAuto's inline family (3 x 1024, fast)
    val (rBig, rSmall, rHot) = (root(), root(), root())
    Graft.cmStoreBuild(big, "ak", rBig)
    Graft.cmStoreBuild(small, "bk", rSmall)
    Graft.cmStoreBuild(hot, "ak", rHot)
    for (((a, ak, ra), (b, bk, rb), opts) <- Seq(
      ((big, "ak", rBig), (small, "bk", rSmall), (100L, 8L)),
      ((hot, "ak", rHot), (small.select(col("bk"), col("bv")), "bk",
        rSmall), (10L, 4L)))) {
      val inline = Graft.joinAuto(a, ak, b, bk,
        broadcastRows = opts._1, skewFactor = opts._2)
      val stored = Graft.joinAutoFromStores(a, ak, b, bk, ra, rb,
        broadcastRows = opts._1, skewFactor = opts._2)
      assert(stored.strategy === inline.strategy)
      assert(stored.joinSizeEst === inline.joinSizeEst)
      assert(stored.planSource === "cm_store")
      assert(inline.planSource === "inline_sketch")
      assert(stored.df.collect().map(_.toSeq).toSet ===
        inline.df.collect().map(_.toSeq).toSet)
    }
    // parameter-family mismatch is loud, not silently wrong
    val rNarrow = root()
    Graft.cmStoreBuild(small, "bk", rNarrow, width = 512)
    val e = intercept[IllegalArgumentException](
      Graft.joinAutoFromStores(big, "ak", small, "bk", rBig, rNarrow))
    assert(e.getMessage.contains("depth, width, fast"))
  }

  test("joinPlan / cmSketch / cmFrequencies / saltedJoin delegate") {
    val a = spark.range(300).select(col("id").as("k"))
    val b = spark.range(900).select((col("id") % 300).as("k"))
    val plan = Graft.joinPlan(Graft.cmSketch(a, "k"), Graft.cmSketch(b, "k"))
    assert(plan.count() === 1)
    val freqs = Graft.cmFrequencies(Graft.cmSketch(b, "k"),
      a.limit(10).select(col("k").as("probe_key")), "probe_key")
    assert(freqs.collect().forall(_.getLong(1) >= 3L))
    val l = spark.range(200).select(col("id").as("lk"), col("id").as("lv"))
    val r = spark.range(600).select((col("id") % 200).as("rk"),
      col("id").as("rv"))
    val salted = Graft.saltedJoin(l, "lk", r, "rk", salts = 4)
      .select("lk", "lv", "rk", "rv")
      .collect().map(_.toSeq).toSet
    assert(salted === plainJoin(l, "lk", r, "rk"))
  }

  // --- link graph ------------------------------------------------------

  test("pageRank / trustRank / trustSelect delegate") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val pr = Graft.pageRank(edges, nIter = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr === LinkGraph.pageRankMicro(edges, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val tr = Graft.trustRank(edges, Seq(1L).toDF("node"), nIter = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tr(4L) === 0L, "unendorsed host must hold zero trust")
    val d = docs.select(col("doc_id"), (col("doc_id") % 4 + 1).as("host"),
      size(split(col("text"), " ")).as("n_words"))
    val sel = Graft.trustSelect(edges, Seq(1L).toDF("node"), d,
      "doc_id", "host", "n_words", budgetTokens = 5000L)
    assert(sel.count() > 0)
    assert(sel.agg(max("cum_tokens")).head().getLong(0) <= 5000L)
    // off-graph hosts score ZERO but stay eligible for leftover
    // budget — not silently excluded from selection (round-12 fix)
    val dOff = docs.limit(20).select(col("doc_id"),
      (col("doc_id") % 4 + 100).as("host"), // hosts 100.. not in graph
      size(split(col("text"), " ")).as("n_words"))
    val selOff = Graft.trustSelect(edges, Seq(1L).toDF("node"), dOff,
      "doc_id", "host", "n_words", budgetTokens = 100000L)
    assert(selOff.count() > 0, "off-graph docs must compete for budget")
    assert(selOff.agg(max("score")).head().getLong(0) === 0L)
  }

  test("intervalJoin / intervalJoinAuto delegate and agree") {
    val pts = spark.range(500).select(col("id").as("pid"),
      (col("id") * 3 % 400).as("t"))
    val ivs = spark.range(40).select(col("id").as("iv_id"),
      (col("id") * 11 % 350).as("lo"),
      (col("id") * 11 % 350 + col("id") % 25 + 1).as("hi"))
    val manual = Graft.intervalJoin(pts, "t", ivs, "lo", "hi", bucket = 16)
      .select("pid", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = Graft.intervalJoinAuto(pts, "t", ivs, "lo", "hi")
      .select("pid", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto === manual && auto.nonEmpty)
  }

  // --- round-10 text/report operators ----------------------------------

  test("minkScores / knScores / corpusReportKAnon / frameSamplePlan delegate") {
    assert(Graft.minkScores(docs.limit(50)).columns
      .contains("mink_score"))
    assert(Graft.minkScores(docs.limit(50)).count() > 0)
    val kn = Graft.knScores(docs.limit(50))
    assert(kn.columns.exists(_.contains("score")) && kn.count() > 0)
    val card = Graft.corpusReportKAnon(docs, Seq("source", "lang"), k = 3)
    assert(card.columns.contains("suppressed") && card.count() > 0)
    val frames = Graft.frameSamplePlan(docs)
    assert(frames.count() >= 0) // text corpus: no media payloads is fine
  }

  test("imagePHash / imageNearDupPairs delegate") {
    val withPayload = docs.limit(120).select(col("doc_id"),
      graft.functions.SyntheticImage
        .syntheticImage(col("doc_id").cast("long"), col("text"))
        .as("payload"))
    val sig = Graft.imagePHash(withPayload)
    assert(sig.columns.toSeq === Seq("doc_id", "format", "width",
      "height", "arows", "ahash", "drows", "dhash"))
    assert(sig.count() > 0)
    val pairs = Graft.imageNearDupPairs(withPayload, maxHamming = 2)
    assert(pairs.columns.toSeq === Seq("doc_a", "doc_b", "hamming"))
    assert(pairs.count() >= 0)
    val wide = Graft.imageNearDupPairsWide(withPayload, maxHamming = 2)
    assert(wide.columns.toSeq === Seq("doc_a", "doc_b", "hamming"))
    assert(wide.count() <= pairs.count()) // combined radius tightens
    val manifest = Graft.imageKeepManifest(
      withPayload.withColumn("status", lit(200)))
    assert(manifest.columns.toSeq ===
      Seq("doc_id", "status", "width", "height", "reason"))
    assert(manifest.count() == withPayload.count()) // every doc tagged
  }

  test("audioPHash / audioNearDupPairs delegate") {
    val withPayload = docs.limit(120).select(col("doc_id"),
      graft.functions.SyntheticWav
        .syntheticWav(col("doc_id").cast("long"), col("text"))
        .as("payload"))
    val sig = Graft.audioPHash(withPayload)
    assert(sig.columns.toSeq === Seq("doc_id", "sample_rate",
      "channels", "n_samples", "arows", "ahash"))
    assert(sig.count() > 0)
    val pairs = Graft.audioNearDupPairs(withPayload, maxHamming = 2)
    assert(pairs.columns.toSeq === Seq("doc_a", "doc_b", "hamming"))
    assert(pairs.count() >= 0)
  }

  test("videoFrameHashes / videoNearDupPairs delegate") {
    val withPayload = docs.limit(120).select(col("doc_id"),
      graft.functions.SyntheticVideo
        .syntheticVideo(col("doc_id").cast("long"), col("text"))
        .as("payload"))
    val fh = Graft.videoFrameHashes(withPayload)
    assert(fh.columns.toSeq === Seq("doc_id", "frame_idx", "ahash",
      "k1", "k2"))
    assert(fh.count() > 0)
    val pairs = Graft.videoNearDupPairs(withPayload, minShared = 2L)
    assert(pairs.columns.toSeq === Seq("doc_a", "doc_b", "shared_frames"))
    assert(pairs.count() >= 0)
    val fuzzy = Graft.videoNearDupPairsBanded(withPayload, minShared = 2L)
    assert(fuzzy.columns.toSeq === Seq("doc_a", "doc_b", "shared_frames"))
    assert(fuzzy.count() >= pairs.count()) // superset of uncapped-exact-ish
    // non-default maxFrames/maxDf must bind to the RIGHT params — an
    // Int-to-Long widening once silently bound maxFrames to maxDf
    // (r14 ADVICE); facade == operator with every dial non-default
    val fz2 = Graft.videoNearDupPairsBanded(withPayload,
      maxHamming = 1, minShared = 1L, maxDf = 7L, maxFrames = 5)
    val op2 = graft.operators.MultiModal.videoNearDupPairsBanded(
      withPayload, "doc_id", "payload",
      maxHamming = 1, minShared = 1L, maxDf = 7L, maxFrames = 5)
    assert(fz2.count() == op2.count())
    assert(fz2.except(op2).isEmpty && op2.except(fz2).isEmpty)
    val segs = Graft.videoSharedSegments(withPayload, minLen = 2L)
    assert(segs.columns.toSeq ===
      Seq("doc_a", "doc_b", "a_start", "b_start", "seg_len"))
    assert(segs.count() >= 0)
  }

  test("phash store facades delegate") {
    val root = tmpRoot("facade_phash")
    val sigs = graft.operators.MultiModal.imagePHashSignatures(
      docs.limit(60).select(col("doc_id"),
        graft.functions.SyntheticImage
          .syntheticImage(col("doc_id").cast("long"), col("text"))
          .as("payload")), "doc_id", "payload")
    val n = Graft.phashStoreUpsert(sigs, root)
    assert(n > 0 && Graft.phashStoreUpsert(sigs, root) == n)
    val served = Graft.phashServe(sigs.select("doc_id", "ahash"), root)
    assert(served.columns.toSeq ===
      Seq("query_id", "match_id", "hamming"))
    assert(served.count() >= n) // every stored doc self-matches at 0
    Graft.phashPublishServeIndex(spark, root, nBuckets = 32, numFiles = 8)
    val pruned = Graft.phashServePruned(
      sigs.select("doc_id", "ahash"), root)
    assert(pruned.columns.toSeq ===
      Seq("query_id", "match_id", "hamming"))
    assert(pruned.count() == served.count()) // same contract, pruned read
    assert(Graft.phashStoreDelete(
      sigs.select("doc_id").limit(1), root) >= 0)
  }

  test("epochSchedule delegates") {
    val got = Graft.epochSchedule(docs, budgetTokens = 3000L,
      maxEpochs = 2)
    assert(got.columns.toSeq === Seq("doc_id", "source", "n_tokens",
      "epoch", "weight_bp"))
    assert(got.collect().toSet ==
      graft.operators.FeatureEng.epochSchedule(docs, "doc_id", "text",
        "source", 3000L, 2).collect().toSet)
  }

  test("count-store retraction delegates: dsir/kn/bpe upsert -> retract -> never-ingested") {
    val base = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    val shard = Seq((10L, "delta delta alpha")).toDF("doc_id", "text")
    val isT = col("doc_id") === 1L
    val dr = tmpRoot("facade_dsir_r")
    Graft.dsirStoreBuild(base, isT, dr, nBuckets = 256)
    assert(Graft.dsirStoreUpsert(shard, isT, dr, "s1"))
    assert(Graft.dsirStoreRetract(shard, isT, dr, "s1"))
    assert(Graft.dsirStoreFreeze(spark, dr) ==
      graft.operators.Dsir.freezeModel(base, "doc_id", "text", isT,
        256, 1.0))
    val kr = tmpRoot("facade_kn_r")
    Graft.knStoreBuild(base, kr)
    assert(Graft.knStoreUpsert(shard, kr, "s1"))
    assert(Graft.knStoreRetract(shard, kr, "s1"))
    assert(Graft.knStoreFreeze(spark, kr).asMap ===
      Graft.knFreeze(base).asMap)
    val br = tmpRoot("facade_bpe_r")
    Graft.bpeStoreBuild(base, br, nMerges = 5, minPairCount = 1L)
    assert(Graft.bpeStoreUpsert(shard, br, "s1"))
    assert(Graft.bpeStoreRetract(shard, br, "s1"))
    val counts = graft.offline.VersionedStore
      .read(spark, graft.operators.Bpe.vocabCountsTable(br))
      .filter(col("cnt") > 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("delta") && counts("alpha") === 2L)
  }

  test("unigram family delegates: train/freeze/encode round-trip") {
    val corpus = Seq((1L, "aba ab aba ba b ab aba"),
      (2L, "ab aba ba ab")).toDF("doc_id", "text")
    val model = Graft.unigramTrain(corpus, vocabSize = 6,
      maxPieceLen = 3, rounds = 2)
    val costs = Graft.unigramFreeze(model)
    assert(costs.nonEmpty && Set("a", "b").subsetOf(costs.keySet))
    val enc = Graft.unigramEncode(corpus, costs, maxPieceLen = 3)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // piece boundaries may differ from word boundaries, but the
    // characters must round-trip exactly
    assert(enc(1L).replace(" ", "") ===
      "aba ab aba ba b ab aba".replace(" ", ""))
    assert(enc(2L).replace(" ", "") === "ab aba ba ab".replace(" ", ""))
    val words = Graft.unigramEncodeWords(
        Seq("aba", "ba").toDF("word"), costs, maxPieceLen = 3)
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[String]]("pieces").mkString("")).toMap
    assert(words === Map("aba" -> "aba", "ba" -> "ba"))
    // sampled mode delegates; alpha 0 equals the exact encode
    val s0 = Graft.unigramEncodeSampled(corpus, costs, maxPieceLen = 3,
        alphaMicro = 0L, seed = 1L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s0 === enc)
    // persisted-model delegates: refresh writes, store serves bit-equal
    val root = tmpRoot("facade_uni_store")
    Graft.bpeStoreBuild(corpus, root, nMerges = 5, minPairCount = 1L)
    val m = Graft.unigramStoreRefresh(spark, root, vocabSize = 6,
      maxPieceLen = 3, rounds = 2)
    val (servedCosts, servedL) = Graft.unigramStoreModel(spark, root)
    assert(servedL === 3 && servedCosts === Graft.unigramFreeze(m))
  }

  test("substr family delegates: spans/dedup, frozen strip, incremental + gram store") {
    val shared = "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"
    val corpus = Seq((1L, s"$shared tail"), (2L, shared))
      .toDF("doc_id", "text")
    val spans = Graft.substrSpans(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans === Set((2L, 1L, 10L)))
    val deduped = Graft.substrDedup(corpus).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(deduped(1L) === s"$shared tail" && deduped(2L) === "")
    val frozen = Graft.substrFreeze(corpus, minDf = 2L)
    assert(frozen.nonEmpty)
    val stripped = Graft.substrStripFrozen(
        Seq((9L, s"x $shared y")).toDF("doc_id", "text"), frozen)
      .head().getString(1)
    assert(stripped === "x y")
    val shard = Seq((10L, s"pre $shared")).toDF("doc_id", "text")
    assert(Graft.substrSpansAgainst(corpus, shard).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((10L, 2L)))
    assert(Graft.substrDedupAgainst(corpus, shard)
      .head().getString(1) === "pre")
    val root = tmpRoot("facade_substr")
    Graft.substrStoreBuild(corpus, root)
    assert(Graft.substrStoreUpsert(
      Seq((20L, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10")).toDF("doc_id", "text"),
      root, "s1"))
    val incr = Graft.substrSpansIncremental(
        Seq((30L, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10 end")).toDF("doc_id", "text"),
        root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(incr === Set((30L, 1L, 10L)))
    assert(Graft.substrDedupIncremental(
        Seq((30L, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10 end")).toDF("doc_id", "text"),
        root).head().getString(1) === "end")
    assert(Graft.substrFreezeFromStore(spark, root, minDf = 1L).toSet ===
      Graft.substrFreeze(corpus.unionByName(
          Seq((20L, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10")).toDF("doc_id", "text")),
        minDf = 1L).toSet)
    // retraction delegates: the shard's grams subtract exactly
    assert(Graft.substrStoreRetract(
      Seq((20L, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10")).toDF("doc_id", "text"),
      root, "s1"))
    assert(Graft.substrSpansIncremental(
        Seq((30L, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10 end")).toDF("doc_id", "text"),
        root)
      .count() === 0L)
  }

  test("round-12 family delegates: doremi / kmeans (+store) / ft multiclass (+store)") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val emb = Tables.embeddings(spark, TestSpark.sfDir)

    // doremi: facade == operator, pluggable excess path agrees
    val w = Graft.doremiWeights(docs).collect()
    assert(w.nonEmpty && w.forall(_.getAs[Long]("share_micro") > 0))
    val viaExcess = Graft.doremiFromExcess(
        graft.operators.Doremi.domainExcess(docs, "doc_id", "text",
          "source"))
      .select("source", "share_micro").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w.map(r => r.getString(0) ->
      r.getAs[Long]("share_micro")).toMap === viaExcess)
    val mix = Graft.doremiMix(docs)
    assert(mix.count() > 0)

    // kmeans: fit → save → load bit-equal; assignment via the loaded
    // model matches the direct one
    val km = Graft.kmeansFit(emb, k = 4, dim = 64, iters = 2)
    val tmp = java.nio.file.Files.createTempDirectory("km_store").toString
    Graft.kmeansSave(spark, km, s"$tmp/km")
    val kmLoaded = Graft.kmeansLoad(spark, s"$tmp/km")
    assert(kmLoaded.k === km.k && kmLoaded.dim === km.dim)
    assert(kmLoaded.centroids.toSeq === km.centroids.toSeq)
    val a1 = Graft.kmeansAssign(emb, km).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = Graft.kmeansAssign(emb, kmLoaded).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 === a2)
    assert(Graft.kmeansBalance(docs, emb, k = 4, dim = 64).count() > 0)

    // multiclass ft: train → save → load bit-equal; stored scorer ==
    // in-memory scorer
    val seed = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"), col("lang"))
    val mc = Graft.ftLangidTrain(seed, "lang", nBuckets = 256, dim = 4,
      epochs = 4)
    Graft.ftMcModelSave(spark, mc, s"$tmp/ftmc")
    val mcLoaded = Graft.ftMcModelLoad(spark, s"$tmp/ftmc")
    assert(mcLoaded.labels.toSeq === mc.labels.toSeq)
    assert(mcLoaded.emb.toSeq === mc.emb.toSeq)
    assert(mcLoaded.w.toSeq === mc.w.toSeq)
    assert(mcLoaded.bMicro.toSeq === mc.bMicro.toSeq)
    val s1 = Graft.ftLangidScore(docs, mc).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    val s2 = Graft.ftLangidScore(docs, mcLoaded).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(s1 === s2)
  }

  test("round-13 facades delegate: md5 minhash, gram vectors, tiered assign/dedup, refresh stores, ccnet, curriculum, rekeyed pack") {
    import graft.operators.{Dedup, FtClassify, Kmeans, TextAnalysis}
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    // dedup families delegate with identical outputs
    assert(Graft.dedupMinhashMd5(docs, threshold = 0.8).collect().toSet
      == Dedup.minhashMd5Pairs(docs, "doc_id", "text", 3, 16, 4, 0.8)
        .collect().toSet)
    assert(Graft.gramPairs(docs, threshold = 0.9).collect().toSet
      == Dedup.gramProjectPairs(docs, "doc_id", "text", 3, 16, 0.9)
        .collect().toSet)
    assert(Graft.gramVectors(docs).count()
      == Dedup.gramProjectVectors(docs, "doc_id", "text", 3, 16).count())
    // tiered assignment / dedup: full probe == the exact facades
    val km = Graft.kmeansFit(emb, k = 4, dim = 64, iters = 2)
    assert(Graft.kmeansAssignTiered(emb, km, nCoarse = 2, nProbe = 2)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      == Graft.kmeansAssign(emb, km).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap)
    assert(Graft.kmeansDedupTiered(emb, 4, 64, 2, 0.985, 2, 2)
        .collect().toSet
      == Graft.kmeansDedup(emb, 4, 64, 2, 0.985).collect().toSet)
    // refresh stores round-trip through the facades
    val tmp = java.nio.file.Files.createTempDirectory("r13fac").toString
    Graft.kmeansRefreshInit(spark, km, s"$tmp/km")
    assert(Graft.kmeansStatsUpsert(emb, s"$tmp/km", "s1"))
    val kr = Graft.kmeansRefresh(spark, s"$tmp/km", maxDrift = 0.0)
    assert(kr.retrained || kr.drift == 0.0)
    assert(Graft.kmeansStatsRetract(spark, s"$tmp/km", "s1"))
    val seed = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"), col("lang"))
    val m0 = Graft.ftMcRefreshInit(seed, "lang", s"$tmp/ft",
      nBuckets = 256, dim = 4, epochs = 3)
    assert(Graft.ftMcSeedUpsert(seed, "lang", s"$tmp/ft") > 0)
    val fr = Graft.ftMcRefresh(spark, s"$tmp/ft")
    assert(!fr.retrained && fr.model.emb.toSeq === m0.emb.toSeq)
    // one-plan pipelines delegate
    assert(Graft.ccnetPipeline(docs).collect().toSet
      == TextAnalysis.ccnetPipeline(docs, "doc_id", "text")
        .collect().toSet)
    assert(Graft.ccnetPipelineFt(docs, m0).collect().toSet
      == TextAnalysis.ccnetPipelineFt(docs, "doc_id", "text", m0)
        .collect().toSet)
    val q = TextAnalysis.quality(docs, "doc_id", "text")
      .select(col("doc_id"), col("quality_score"), col("n_words"))
    assert(Graft.curriculumPack(q, "quality_score", "n_words", 512L)
        .collect().toSet
      == graft.operators.FeatureEng.curriculumPack(q, "doc_id",
        "quality_score", "n_words", 512L).collect().toSet)
    assert(Graft.inContextPackRekeyed(docs, emb, k = 2, dim = 64,
      iters = 1, seqLen = 256L).count() > 0)
    // late-round facades: soft dedup + length batching delegate
    assert(Graft.softDedupWeights(docs).collect().toSet
      == Dedup.softDedupWeights(docs, "doc_id", "text").collect().toSet)
    assert(Graft.lengthBatches(docs, nBuckets = 4, batchSize = 16)
        .collect().toSet
      == graft.operators.FeatureEng.lengthBatches(docs, "doc_id",
        "text", 4, 16).collect().toSet)
  }
}
