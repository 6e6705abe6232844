package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Fns, HllSketch}
import graft.operators.{MultiModal, Sketch, TextAnalysis}

class SketchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def shingleStream: DataFrame =
    Tables.documents(spark, sf).select(col("source"),
      explode(Fns.shingles(col("text"), 3)).as("shingle"))

  // -----------------------------------------------------------------
  // HyperLogLog
  // -----------------------------------------------------------------

  test("one-pass HllSketchAgg estimate equals the in-plan HLL twin") {
    val inPlan = Sketch.hllDistinct(shingleStream, "shingle", Seq("source"))
      .select("source", "hll_estimate")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val onePass = Sketch.mergeEstimate(
        Sketch.hllSketchTable(shingleStream, "shingle", Seq("source")),
        Seq("source"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("hll_estimate")).toMap
    assert(onePass === inPlan)
    assert(inPlan.nonEmpty)
  }

  test("sketch merge of shards equals the direct sketch, register-exact") {
    val byShard = Sketch.hllSketchTable(
      shingleStream.withColumn("shard", col("shingle").substr(1, 1)),
      "shingle", Seq("source", "shard"))
    val merged = byShard.groupBy("source")
      .agg(HllSketch.merge(col("sketch")).as("sketch"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Array[Byte]]("sketch").toSeq).toMap
    val direct = Sketch.hllSketchTable(shingleStream, "shingle", Seq("source"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Array[Byte]]("sketch").toSeq).toMap
    assert(merged === direct)
  }

  test("sketch is partitioning-independent (partial-merge path)") {
    def est(parts: Int): Map[String, Double] =
      Sketch.mergeEstimate(
        Sketch.hllSketchTable(shingleStream.repartition(parts),
          "shingle", Seq("source")), Seq("source"))
        .collect().map(r => r.getAs[String]("source") ->
          r.getAs[Double]("hll_estimate")).toMap
    assert(est(1) === est(13))
  }

  test("HLL error is within the advertised band on a known cardinality") {
    // 5000 distinct synthetic keys, p=8 → m=256, stderr ~6.5%; assert
    // within 4 sigma (26%) — deterministic given the md5 family.
    val keys = spark.range(5000).select(lit("g").as("g"),
      concat(lit("key:"), col("id")).as("k"))
    val est = Sketch.hllDistinct(keys, "k", Seq("g"))
      .select("hll_estimate").head().getDouble(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.26, s"estimate $est")
  }

  // -----------------------------------------------------------------
  // KMV
  // -----------------------------------------------------------------

  test("KMV: identical slices estimate Jaccard 1, disjoint slices 0") {
    val a = spark.range(500).select(lit("a").as("slice"),
      concat(lit("x"), col("id")).as("k"))
    val b = spark.range(500).select(lit("b").as("slice"),
      concat(lit("x"), col("id")).as("k"))
    val c = spark.range(500).select(lit("c").as("slice"),
      concat(lit("y"), col("id")).as("k"))
    val out = Sketch.kmvOverlap(a.union(b).union(c), "k", "slice", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(out(("a", "b")) === ((1.0, 1.0)))
    assert(out(("a", "c")) === ((0.0, 0.0)))
    assert(out(("b", "c")) === ((0.0, 0.0)))
  }

  test("KMV estimate tracks exact Jaccard on partial overlap") {
    // slice a = 0..999, slice b = 500..1499 → J = 1/3.
    val a = spark.range(1000).select(lit("a").as("slice"),
      concat(lit("k"), col("id")).as("k"))
    val b = spark.range(500, 1500).select(lit("b").as("slice"),
      concat(lit("k"), col("id")).as("k"))
    val r = Sketch.kmvOverlap(a.union(b), "k", "slice", k = 128).head()
    val est = r.getAs[Double]("jaccard_est")
    val exact = r.getAs[Double]("jaccard_exact")
    assert(math.abs(exact - 1.0 / 3.0) < 0.001)
    assert(math.abs(est - exact) < 0.15, s"est $est exact $exact")
  }

  // -----------------------------------------------------------------
  // Bloom
  // -----------------------------------------------------------------

  private def bloomFrame = {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("doc_id").cast("string").as("k"))
    val isDrop = Fns.md5Hash31(concat(lit("takedown:"), col("k"))) % 10 === 0
    (docs, docs.filter(isDrop).select(col("k")), isDrop)
  }

  test("bloom membership has zero false negatives") {
    val (docs, drops, isDrop) = bloomFrame
    val out = Sketch.bloomMembership(docs, "k", drops, "k",
        mBits = 256, kHashes = 2)
      .withColumn("exact_drop", isDrop)
    assert(out.filter(col("exact_drop") && !col("bloom_hit")).count() === 0L)
    // and the filter is not vacuously all-positive
    assert(out.filter(!col("bloom_hit")).count() > 0L)
    assert(drops.count() > 0L)
  }

  test("fast (xxhash64) bloom family: zero false negatives, probe == join form") {
    val (docs, drops, isDrop) = bloomFrame
    val out = Sketch.bloomMembership(docs, "k", drops, "k",
        mBits = 256, kHashes = 2, fast = true)
      .withColumn("exact_drop", isDrop)
    assert(out.filter(col("exact_drop") && !col("bloom_hit")).count() === 0L)
    assert(out.filter(!col("bloom_hit")).count() > 0L)
    val joined = out.select(col("doc_id"), col("bloom_hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val bitset = Sketch.bloomBitsetLit(drops, "k", 256, 2, fast = true)
    val viaBits = docs.select(col("doc_id"),
        Sketch.bloomProbe(bitset, col("k"), 256, 2, fast = true).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaBits === joined)
  }

  test("bloom membership is invariant to probe-key multiplicity") {
    // a key duplicated d times must still count kHashes DISTINCT
    // position hits — the count(*) form saw d*kHashes and reported a
    // false NEGATIVE for every duplicated in-list key
    val (docs, drops, isDrop) = bloomFrame
    val dup = docs.union(docs).union(docs)
    val out = Sketch.bloomMembership(dup, "k", drops, "k",
        mBits = 256, kHashes = 2)
      .withColumn("exact_drop", isDrop)
    assert(out.filter(col("exact_drop") && !col("bloom_hit")).count() === 0L,
      "duplicated probe keys must not produce false negatives")
    // verdicts agree row-for-row with the unduplicated run
    val singles = Sketch.bloomMembership(docs, "k", drops, "k",
        mBits = 256, kHashes = 2)
      .select(col("doc_id"), col("bloom_hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    out.select(col("doc_id"), col("bloom_hit")).collect()
      .foreach(r => assert(r.getBoolean(1) === singles(r.getLong(0))))
  }

  test("literal-bitset probe equals the join-based bloom membership") {
    val (docs, drops, _) = bloomFrame
    val joined = Sketch.bloomMembership(docs, "k", drops, "k",
        mBits = 256, kHashes = 2)
      .select(col("doc_id"), col("bloom_hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val bitset = Sketch.bloomBitsetLit(drops, "k", mBits = 256, kHashes = 2)
    val lit256 = docs.select(col("doc_id"),
        Sketch.bloomProbe(bitset, col("k"), 256, 2).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(lit256 === joined)
  }

  // -----------------------------------------------------------------
  // Kneser-Ney bigram LM
  // -----------------------------------------------------------------

  test("KN bigram probability matches the closed form on a toy corpus") {
    val docs = Seq((0L, "a b"), (1L, "a b"), (2L, "a c"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.knBigramScore(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"),
          Option(r.get(r.fieldIndex("kn_score")))))).toMap
    // model: c(a,b)=2 c(a,c)=1; c1(a)=3 n1f(a)=2; prec(b)=prec(c)=1; B=2
    val d = 0.75
    val pAB = (2 - d) / 3 + d * 2 / 3 * (1.0 / 2)
    val pAC = (1 - d) / 3 + d * 2 / 3 * (1.0 / 2)
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L) === ((1L, Some(r4(-math.log(pAB) / math.log(2.0))))))
    assert(out(2L) === ((1L, Some(r4(-math.log(pAC) / math.log(2.0))))))
    assert(out(3L) === ((0L, None))) // 1-word doc: no bigrams, NULL score
  }

  test("KN scores are defined and positive over the corpus") {
    val out = TextAnalysis.knBigramScore(
      Tables.documents(spark, sf), "doc_id", "text")
    assert(out.filter(col("n_bigrams") > 0 &&
      (col("kn_score").isNull || col("kn_score") <= 0)).count() === 0L)
    assert(out.count() === Tables.documents(spark, sf).count())
  }

  private def knRows(df: DataFrame): Map[Long, (Long, Option[Any])] =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_bigrams"),
        Option(r.get(r.fieldIndex("kn_score")))))).toMap

  test("frozen KN scorer equals the in-plan fit on the training corpus") {
    val docs = Tables.documents(spark, sf).localCheckpoint(false)
    val model = TextAnalysis.knFreeze(docs, "doc_id", "text")
    val frozen = knRows(TextAnalysis.knScoreFrozen(docs, "doc_id", "text",
      model))
    val inPlan = knRows(TextAnalysis.knBigramScore(docs, "doc_id", "text"))
    assert(frozen === inPlan)
    // serving on unseen text: unknown bigrams are skipped from the
    // mean exactly as the in-plan inner join skips them
    val unseen = Seq((900L, "xqzzy frobnitz blorp")).toDF("doc_id", "text")
    assert(knRows(TextAnalysis.knScoreFrozen(unseen, "doc_id", "text",
      model)) === Map(900L -> ((0L, None))))
  }

  test("KN store: additive shard upserts; store freeze == corpus freeze") {
    val root = java.nio.file.Files
      .createTempDirectory("knstore").toString + "/kn"
    val docs = Tables.documents(spark, sf).localCheckpoint(false)
    val s0 = docs.filter(col("doc_id") % 3 === 0)
    val s1 = docs.filter(col("doc_id") % 3 === 1)
    val s2 = docs.filter(col("doc_id") % 3 === 2)
    TextAnalysis.knBuildStore(s0, "doc_id", "text", root)
    assert(TextAnalysis.knUpsertCounts(s1, "doc_id", "text", root, "s1"))
    assert(TextAnalysis.knUpsertCounts(s2, "doc_id", "text", root, "s2"))
    assert(!TextAnalysis.knUpsertCounts(s1, "doc_id", "text", root, "s1"),
      "replayed shard must no-op — additive counts would double")
    // stored counts == direct counts over the union (bigrams never
    // span documents, so doc-sharding is exactly additive)
    val stored = graft.offline.VersionedStore.read(spark, root + "/kn_c12")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val direct = TextAnalysis.knBigramCounts(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(stored === direct)
    // the frozen artifact from the store == frozen from the corpus
    val fromStore = TextAnalysis.knFreezeFromStore(spark, root)
    val fromCorpus = TextAnalysis.knFreeze(docs, "doc_id", "text")
    assert(fromStore.asMap === fromCorpus.asMap)
    assert(fromStore.discount === fromCorpus.discount)
  }

  test("KN store retraction: subtracted counts equal never-ingested; freeze matches") {
    val root = java.nio.file.Files
      .createTempDirectory("knretract").toString + "/kn"
    val base = Seq((1L, "a b c a b"), (2L, "b c d")).toDF("doc_id", "text")
    val shard = Seq((10L, "a b e f"), (11L, "x y")).toDF("doc_id", "text")
    TextAnalysis.knBuildStore(base, "doc_id", "text", root)
    assert(TextAnalysis.knUpsertCounts(shard, "doc_id", "text", root, "s1"))
    assert(TextAnalysis.knRetractCounts(shard, "doc_id", "text", root, "s1"))
    val stored = graft.offline.VersionedStore.read(spark, root + "/kn_c12")
      .filter(col("c12") > 0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val direct = TextAnalysis.knBigramCounts(base, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(stored === direct, "retracted store must equal never-ingested")
    assert(TextAnalysis.knFreezeFromStore(spark, root).asMap ===
      TextAnalysis.knFreeze(base, "doc_id", "text").asMap)
    // generation cycle + double-retract no-op
    assert(!TextAnalysis.knRetractCounts(shard, "doc_id", "text", root, "s1"))
    assert(TextAnalysis.knUpsertCounts(shard, "doc_id", "text", root, "s1"))
    assert(TextAnalysis.knFreezeFromStore(spark, root).asMap ===
      TextAnalysis.knFreeze(base.unionByName(shard),
        "doc_id", "text").asMap)
  }

  test("KN freeze maxTypes guard fails loudly, never truncates silently") {
    val docs = Tables.documents(spark, sf)
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.knFreeze(docs, "doc_id", "text", maxTypes = 5)
    }
    assert(ex.getMessage.contains("maxTypes"))
  }

  // -----------------------------------------------------------------
  // Frame sampling
  // -----------------------------------------------------------------

  test("frame sampling grids real parsed durations, capped at maxFrames") {
    val docs = Tables.documents(spark, sf)
    val withPayload = docs.select(col("doc_id"),
      MultiModal.syntheticMediaPayload("doc_id", "text").as("payload"))
    val out = MultiModal.frameSampleByTime(withPayload, "doc_id", "payload",
      intervalMs = 1000L, maxFrames = 16)
    val byDoc = out.groupBy("doc_id", "format", "n_frames")
      .agg(count(lit(1)).as("n"), max("ts_ms").as("max_ts"),
        min("ts_ms").as("min_ts"))
      .collect()
    assert(byDoc.nonEmpty)
    byDoc.foreach { r =>
      val n = r.getAs[Long]("n_frames")
      assert(n >= 1 && n <= 16)
      assert(r.getAs[Long]("n") === n)       // one row per grid point
      assert(r.getAs[Long]("min_ts") === 0L) // grid starts at 0
      assert(r.getAs[Long]("max_ts") === (n - 1) * 1000L)
    }
    // the cap binds for long mp4 durations (id*37+500 > 16s for id>419)
    assert(byDoc.exists(r => r.getAs[String]("format") == "mp4" &&
      r.getAs[Long]("n_frames") == 16L))
    // non-media payload rows never surface
    val ids = byDoc.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.forall(_ % 5 != 4))
  }

  // -----------------------------------------------------------------
  // Persisted sketch store + streaming twin
  // -----------------------------------------------------------------

  test("sketch store: shard upserts equal the direct sketch; replays no-op") {
    val root = java.nio.file.Files
      .createTempDirectory("hllstore").toString + "/sk"
    val all = shingleStream.localCheckpoint(false)
    val base = all.filter(length(col("shingle")) % 3 === 0)
    val s1 = all.filter(length(col("shingle")) % 3 === 1)
    val s2 = all.filter(length(col("shingle")) % 3 === 2)
    Sketch.buildSketchStore(base, "shingle", Seq("source"), root)
    assert(Sketch.upsertSketches(s1, "shingle", Seq("source"), root, "s1"))
    assert(Sketch.upsertSketches(s2, "shingle", Seq("source"), root, "s2"))
    // replayed shard: ledger no-op
    assert(!Sketch.upsertSketches(s1, "shingle", Seq("source"), root, "s1"))
    val stored = graft.offline.VersionedStore
      .read(spark, root + "/hll_sketches")
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Array[Byte]]("sketch").toSeq).toMap
    val direct = Sketch.hllSketchTable(all, "shingle", Seq("source"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Array[Byte]]("sketch").toSeq).toMap
    assert(stored === direct, "shard-folded registers must equal direct")
    // regrouped read: collapsing the source dimension over the STORE
    // equals collapsing it over the direct sketches
    val globalEst = Sketch.readDistinct(spark, root, Seq.empty[String])
      .head().getAs[Double]("hll_estimate")
    val directGlobal = Sketch.mergeEstimate(
      Sketch.hllSketchTable(all, "shingle", Seq("source"))
        .withColumn("g", lit("all")), Seq("g"))
      .head().getAs[Double]("hll_estimate")
    assert(globalEst === directGlobal)
  }

  // -----------------------------------------------------------------
  // Non-invertible store takedown: rebuild + interim suppression
  // -----------------------------------------------------------------

  test("hll takedown: suppressed serve == rebuild serve; ledger records both") {
    val root = java.nio.file.Files
      .createTempDirectory("hll-td").toString + "/sk"
    val all = shingleStream.localCheckpoint(false)
    val victim = all.select("source").distinct()
      .orderBy("source").head().getString(0)
    val remaining = all.filter(col("source") =!= victim)
    Sketch.buildSketchStore(all, "shingle", Seq("source"), root)
    def serve(): Map[String, Double] =
      Sketch.readDistinct(spark, root, Seq("source"))
        .collect().map(r => r.getAs[String]("source") ->
          r.getAs[Double]("hll_estimate")).toMap
    val before = serve()
    assert(before.contains(victim))
    // register: interim serve must suppress the group EXACTLY —
    // untouched groups' registers are byte-identical to a rebuild's
    assert(Sketch.registerTakedown(
      Seq(victim).toDF("source"), root, "hll", "td1"))
    assert(!Sketch.registerTakedown(
      Seq(victim).toDF("source"), root, "hll", "td1"), "replay must no-op")
    val suppressed = serve()
    assert(!suppressed.contains(victim), "registered group still served")
    assert(suppressed === before - victim)
    // rebuild from the remaining corpus: serve unchanged (the spec's
    // ==), suppression list cleared, ledger holds takedown + rebuild
    Sketch.rebuildSketchStore(remaining, "shingle", Seq("source"),
      root, "td1")
    assert(serve() === suppressed,
      "serve-after-takedown must equal rebuild-serve")
    val ledger = graft.offline.VersionedStore
      .read(spark, root + "/hll_applied")
      .collect().map(_.getString(0)).toSet
    assert(ledger.contains("takedown:td1") && ledger.contains("rebuild:td1"))
    // post-rebuild the store is live again: the victim group can
    // re-ingest and serves normally (suppression really cleared)
    assert(Sketch.upsertSketches(all.filter(col("source") === victim),
      "shingle", Seq("source"), root, "victim-back"))
    assert(serve() === before)
  }

  test("kmv takedown: suppressed overlap serve == rebuild serve") {
    val root = java.nio.file.Files
      .createTempDirectory("kmv-td").toString + "/sk"
    val all = shingleStream.localCheckpoint(false)
    val victim = all.select("source").distinct()
      .orderBy("source").head().getString(0)
    Sketch.buildKmvStore(all, "shingle", "source", root, k = 32)
    def serve(): Map[(String, String), Double] =
      Sketch.readOverlap(spark, root).collect()
        .map(r => (r.getAs[String]("slice_a"), r.getAs[String]("slice_b")) ->
          r.getAs[Double]("jaccard_est")).toMap
    val before = serve()
    assert(Sketch.registerTakedown(
      Seq(victim).toDF("slice"), root, "kmv", "td1"))
    val suppressed = serve()
    assert(suppressed.keys.forall(p => p._1 != victim && p._2 != victim))
    assert(suppressed === before.filter(p =>
      p._1._1 != victim && p._1._2 != victim))
    Sketch.rebuildKmvStore(all.filter(col("source") =!= victim),
      "shingle", "source", root, "td1")
    assert(serve() === suppressed,
      "serve-after-takedown must equal rebuild-serve")
  }

  test("quantile takedown: suppressed serve == rebuild serve") {
    val root = java.nio.file.Files
      .createTempDirectory("qs-td").toString + "/sk"
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        length(col("text")).cast("double").as("v"))
      .localCheckpoint(false)
    val victim = docs.select("source").distinct()
      .orderBy("source").head().getString(0)
    Sketch.buildQuantileStore(docs, "v", "doc_id", "source", root, k = 64)
    def serve(): Map[String, (Double, Double)] =
      Sketch.readQuantiles(spark, root).collect()
        .map(r => r.getAs[String]("slice") ->
          (r.getAs[Double]("p50_sample"), r.getAs[Double]("p95_sample")))
        .toMap
    val before = serve()
    assert(before.contains(victim))
    assert(Sketch.registerTakedown(
      Seq(victim).toDF("slice"), root, "quantile", "td1"))
    val suppressed = serve()
    assert(suppressed === before - victim)
    Sketch.rebuildQuantileStore(docs.filter(col("source") =!= victim),
      "v", "doc_id", "source", root, "td1")
    assert(serve() === suppressed,
      "serve-after-takedown must equal rebuild-serve")
  }

  test("takedown guards: CM refused; reserved shard ids refused") {
    val ex = intercept[IllegalArgumentException] {
      Sketch.registerTakedown(Seq("x").toDF("k"), "/tmp/nope", "cm", "t")
    }
    assert(ex.getMessage.contains("retractCm"))
    val root = java.nio.file.Files
      .createTempDirectory("hll-guard").toString + "/sk"
    Sketch.buildSketchStore(shingleStream, "shingle", Seq("source"), root)
    intercept[IllegalArgumentException] {
      Sketch.upsertSketches(shingleStream, "shingle", Seq("source"),
        root, "takedown:evil")
    }
    intercept[IllegalArgumentException] {
      Sketch.upsertSketches(shingleStream, "shingle", Seq("source"),
        root, "rebuild:evil")
    }
    // wrong identity columns would register keys no read ever
    // matches — a silent compliance miss, refused loudly instead
    val exCols = intercept[IllegalArgumentException] {
      Sketch.registerTakedown(Seq("x").toDF("wrong_col"), root, "hll", "t9")
    }
    assert(exCols.getMessage.contains("group columns"))
  }

  test("quantile sketch: known quantiles exact; k >= n sample equals exact") {
    // one group, values 0..100 → p50 = 50, p95 = 95 under the
    // floor(q*(n-1)) definition
    val df = spark.range(101).select(lit("g").as("g"),
      col("id").cast("double").as("v"), col("id").as("rid"))
    val out = Sketch.quantileSketch(df, "v", "rid", Seq("g"),
      k = 1000, qs = Seq(0.5, 0.95)).head()
    assert(out.getAs[Double]("p50_exact") === 50.0)
    assert(out.getAs[Double]("p95_exact") === 95.0)
    // sample is the whole group when k >= n → estimates == exact
    assert(out.getAs[Double]("p50_sample") === 50.0)
    assert(out.getAs[Double]("p95_sample") === 95.0)
    assert(out.getAs[Long]("n_sample") === 101L)
  }

  test("quantile sketch sample is mergeable: bottom-k of shard bottom-ks == direct") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type").as("g"), col("value").as("v"),
        md5(col("event_id").cast("string")).as("h"))
    def bottomK(df: org.apache.spark.sql.DataFrame, k: Int) = df
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("h")))
      .filter(col("rn") <= k).select("g", "v", "h")
    val direct = bottomK(ev, 64).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    val shards = Seq(
      ev.filter(length(col("h")) >= 0 && substring(col("h"), 1, 1) < "8"),
      ev.filter(substring(col("h"), 1, 1) >= "8"))
    val merged = bottomK(shards.map(bottomK(_, 64)).reduce(_ union _), 64)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    assert(merged === direct)
  }

  test("quantile sketch estimates land near exact on the events table") {
    val out = Sketch.quantileSketch(Tables.events(spark, sf), "value",
        "event_id", Seq("event_type"), k = 128, qs = Seq(0.5))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getAs[Double]("p50_sample")
      val ex = r.getAs[Double]("p50_exact")
      val n = r.getAs[Long]("n_exact")
      // rank error ~1/sqrt(k): compare by RANK proximity via value
      // spread — generous 4-sigma band on the value scale
      assert(!est.isNaN && !ex.isNaN)
      if (n > 200) {
        val spread = math.abs(ex) + 1.0
        assert(math.abs(est - ex) < spread,
          s"${r.getAs[String]("event_type")}: est $est vs exact $ex")
      }
    }
  }

  test("KMV store: shard upserts equal the direct bottom-k; overlap reads from the store") {
    val root = java.nio.file.Files
      .createTempDirectory("kmvstore").toString + "/sk"
    val all = shingleStream.localCheckpoint(false)
    val base = all.filter(length(col("shingle")) % 3 === 0)
    val s1 = all.filter(length(col("shingle")) % 3 === 1)
    val s2 = all.filter(length(col("shingle")) % 3 === 2)
    Sketch.buildKmvStore(base, "shingle", "source", root, k = 32)
    assert(Sketch.upsertKmv(s1, "shingle", "source", root, "s1"))
    assert(Sketch.upsertKmv(s2, "shingle", "source", root, "s2"))
    assert(!Sketch.upsertKmv(s1, "shingle", "source", root, "s1"))
    val stored = graft.offline.VersionedStore
      .read(spark, root + "/kmv_sketches").select("slice", "h")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val direct = Sketch.kmvSketchRows(all, "shingle", "source", k = 32)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(stored === direct, "shard-folded bottom-k must equal direct")
    // overlap straight from the store == the live sketch-only operator
    val fromStore = Sketch.readOverlap(spark, root)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val live = Sketch.kmvOverlap(all, "shingle", "source", k = 32,
        audit = false)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(fromStore === live)
  }

  test("StreamingSketch: micro-batches fold registers exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files
      .createTempDirectory("hllstream").toString + "/sk"
    val base = Seq(("src0", "alpha"), ("src0", "beta"), ("src1", "gamma"))
      .toDF("source", "k")
    Sketch.buildSketchStore(base, "k", Seq("source"), root)
    val in = MemoryStream[(String, String)]
    val q = graft.streaming.StreamingSketch.start(
      in.toDS().toDF("source", "k"), "k", Seq("source"), root,
      java.nio.file.Files.createTempDirectory("hllstream_ck").toString)
    val b1 = Seq(("src0", "delta"), ("src2", "epsilon"))
    val b2 = (1 to 300).map(i => ("src1", s"key$i"))
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val stored = graft.offline.VersionedStore
      .read(spark, root + "/hll_sketches")
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Array[Byte]]("sketch").toSeq).toMap
    val direct = Sketch.hllSketchTable(
        base.unionByName(b1.toDF("source", "k"))
          .unionByName(b2.toDF("source", "k")), "k", Seq("source"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Array[Byte]]("sketch").toSeq).toMap
    assert(stored === direct, "streamed registers must equal batch")
  }

  // -----------------------------------------------------------------
  // Count-Min
  // -----------------------------------------------------------------

  private def ordersKeys: DataFrame = Tables.orders(spark, sf)
    .select(col("o_custkey").cast("string").as("k"))

  test("CM point estimate is one-sided (>= exact), exact when collision-free") {
    val probes = ordersKeys.distinct().select(col("k").as("probe_key"))
    val exact = ordersKeys.groupBy(col("k").as("probe_key"))
      .agg(count(lit(1)).as("exact_cnt"))
    def run(width: Int): Map[String, (Long, Long)] =
      Sketch.cmPointEstimate(
          Sketch.cmSketchRows(ordersKeys, "k", depth = 3, width = width),
          probes, "probe_key", depth = 3, width = width)
        .join(exact, Seq("probe_key"))
        .collect()
        .map(r => r.getAs[String]("probe_key") ->
          (r.getAs[Long]("cm_est"), r.getAs[Long]("exact_cnt"))).toMap
    val tight = run(64) // forced collisions
    assert(tight.nonEmpty)
    tight.foreach { case (k, (est, ex)) =>
      assert(est >= ex, s"$k: CM must never undercount ($est < $ex)")
    }
    // with ~150 distinct keys, 3 rows of 2^17 cells are collision-free
    // w.h.p. → every estimate lands exactly
    run(131072).foreach { case (k, (est, ex)) =>
      assert(est === ex, s"$k: collision-free CM must be exact")
    }
    // absent probe key → estimate 0 (or a collision's count), never null
    val ghost = Sketch.cmPointEstimate(
        Sketch.cmSketchRows(ordersKeys, "k", depth = 3, width = 131072),
        spark.range(1).select(lit("no-such-key").as("probe_key")),
        "probe_key", depth = 3, width = 131072).head()
    assert(ghost.getAs[Long]("cm_est") === 0L)
  }

  test("fast (xxhash64) CM family: same one-sided/exactness contracts") {
    val probes = ordersKeys.distinct().select(col("k").as("probe_key"))
    val exact = ordersKeys.groupBy(col("k").as("probe_key"))
      .agg(count(lit(1)).as("exact_cnt"))
    val tight = Sketch.cmPointEstimate(
        Sketch.cmSketchRows(ordersKeys, "k", depth = 3, width = 64,
          fast = true),
        probes, "probe_key", depth = 3, width = 64, fast = true)
      .join(exact, Seq("probe_key")).collect()
    assert(tight.nonEmpty)
    tight.foreach { r =>
      assert(r.getAs[Long]("cm_est") >= r.getAs[Long]("exact_cnt"))
    }
    Sketch.cmPointEstimate(
        Sketch.cmSketchRows(ordersKeys, "k", depth = 3, width = 131072,
          fast = true),
        probes, "probe_key", depth = 3, width = 131072, fast = true)
      .join(exact, Seq("probe_key")).collect()
      .foreach { r =>
        assert(r.getAs[Long]("cm_est") === r.getAs[Long]("exact_cnt"),
          "collision-free fast CM must be exact")
      }
    // the store records the family: a fast-built store probes fast
    val root = java.nio.file.Files
      .createTempDirectory("cmfast").toString + "/sk"
    Sketch.buildCmStore(ordersKeys, "k", root, depth = 3, width = 131072,
      fast = true)
    val fromStore = Sketch.readCmEstimates(spark, root, probes, "probe_key")
      .join(exact, Seq("probe_key")).collect()
    fromStore.foreach { r =>
      assert(r.getAs[Long]("cm_est") === r.getAs[Long]("exact_cnt"),
        "store must probe with the family it was built with")
    }
  }

  test("fast CM family is key-type stable: long-typed keys == their string form") {
    // xxhash64 is type-sensitive; cmPos casts to string so a
    // long-keyed build probed with string keys (or vice versa) can
    // never undercount
    def cells(df: DataFrame): Map[(Int, Long), Long] =
      Sketch.cmSketchRows(df, "k", depth = 2, width = 64, fast = true)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    val longKeys = spark.range(500).select((col("id") % 50).as("k"))
    val strKeys = spark.range(500)
      .select((col("id") % 50).cast("string").as("k"))
    assert(cells(longKeys) === cells(strKeys))
  }

  test("CM cells are additive: shard sketches sum to the union sketch") {
    val all = ordersKeys.localCheckpoint(false)
    val shards = Seq(all.filter(col("k") % 3 === 0),
      all.filter(col("k") % 3 === 1), all.filter(col("k") % 3 === 2))
    def cells(df: DataFrame): Map[(Int, Long), Long] =
      Sketch.cmSketchRows(df, "k", depth = 3, width = 256).collect()
        .map(r => (r.getAs[Int]("di"), r.getAs[Long]("pos")) ->
          r.getAs[Long]("cnt")).toMap
    val summed = shards.map(cells).reduce { (a, b) =>
      (a.keySet ++ b.keySet).map(k =>
        k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    }
    assert(summed === cells(all))
  }

  test("CM join-size estimate >= exact, exact when collision-free") {
    val a = ordersKeys
    val b = Tables.lineitem(spark, sf)
      .select(col("l_suppkey").cast("string").as("k"))
    val exact = a.join(b, Seq("k")).count()
    def est(width: Int): Long = Sketch.cmJoinSizeEstimate(
        Sketch.cmSketchRows(a, "k", depth = 3, width = width),
        Sketch.cmSketchRows(b, "k", depth = 3, width = width))
      .head().getAs[Long]("join_size_est")
    assert(est(64) >= exact, "inner product must never undercount")
    assert(est(262144) === exact, "collision-free inner product is exact")
  }

  test("CM join-size estimate: an overlap-free depth row proves 0") {
    // disjoint key sets whose cells never collide at width 4096: at
    // least one depth row has zero overlapping cells, which PROVES
    // the join is empty — the inner-join form dropped that row from
    // the min and reported a large estimate instead of 0
    val a = Seq("a1", "a2", "a3", "a4", "a5").toDF("k")
    val b = Seq("b1", "b2", "b3", "b4", "b5").toDF("k")
    val est = Sketch.cmJoinSizeEstimate(
        Sketch.cmSketchRows(a, "k", depth = 3, width = 4096),
        Sketch.cmSketchRows(b, "k", depth = 3, width = 4096))
      .head().getAs[Long]("join_size_est")
    assert(est === 0L, s"provably-empty join estimated $est")
  }

  test("sketch store freezes p at build time; upserts read it back") {
    // a non-default p: the upsert must sketch its shard at the
    // STORE's p (read from hll_params), or new groups would get
    // wrong-size register arrays and poison later merges
    val root = java.nio.file.Files
      .createTempDirectory("hllstore-p").toString + "/sk"
    val all = shingleStream.localCheckpoint(false)
    val base = all.filter(length(col("shingle")) % 2 === 0)
    val s1 = all.filter(length(col("shingle")) % 2 === 1)
    Sketch.buildSketchStore(base, "shingle", Seq("source"), root, p = 6)
    assert(Sketch.upsertSketches(s1, "shingle", Seq("source"), root, "s1"))
    val stored = graft.offline.VersionedStore
      .read(spark, root + "/hll_sketches")
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Array[Byte]]("sketch").toSeq).toMap
    val direct = Sketch.hllSketchTable(all, "shingle", Seq("source"), p = 6)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Array[Byte]]("sketch").toSeq).toMap
    assert(stored === direct,
      "upsert at the stored p must equal the direct p=6 sketch")
  }

  test("CM store: additive shard upserts equal the direct sketch; replays no-op") {
    val root = java.nio.file.Files
      .createTempDirectory("cmstore").toString + "/sk"
    val all = ordersKeys.localCheckpoint(false)
    val base = all.filter(col("k") % 3 === 0)
    val s1 = all.filter(col("k") % 3 === 1)
    val s2 = all.filter(col("k") % 3 === 2)
    Sketch.buildCmStore(base, "k", root, depth = 3, width = 256)
    assert(Sketch.upsertCm(s1, "k", root, "s1"))
    assert(Sketch.upsertCm(s2, "k", root, "s2"))
    assert(!Sketch.upsertCm(s1, "k", root, "s1"),
      "replayed shard must no-op — additive counts would double")
    val stored = graft.offline.VersionedStore.read(spark, root + "/cm_sketch")
      .collect().map(r => (r.getAs[Int]("di"), r.getAs[Long]("pos")) ->
        r.getAs[Long]("cnt")).toMap
    val direct = Sketch.cmSketchRows(all, "k", depth = 3, width = 256)
      .collect().map(r => (r.getAs[Int]("di"), r.getAs[Long]("pos")) ->
        r.getAs[Long]("cnt")).toMap
    assert(stored === direct, "shard-folded cells must equal direct")
    // watchlist read straight from the store == live estimates
    val probes = all.distinct().select(col("k").as("probe_key"))
    val fromStore = Sketch.readCmEstimates(spark, root, probes, "probe_key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val live = Sketch.cmPointEstimate(
        Sketch.cmSketchRows(all, "k", depth = 3, width = 256),
        probes, "probe_key", depth = 3, width = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromStore === live)
  }

  test("cmStats bounds are provable: hot_bound >= true max, distinct_lb <= true distinct") {
    val keys = ordersKeys.localCheckpoint(false)
    val trueMax = keys.groupBy("k").count()
      .agg(max("count")).head().getLong(0)
    val trueDistinct = keys.select("k").distinct().count()
    val st = Sketch.cmStats(
      Sketch.cmSketchRows(keys, "k", depth = 3, width = 128)).head()
    assert(st.getAs[Long]("n_rows") === keys.count())
    assert(st.getAs[Long]("hot_bound") >= trueMax)
    assert(st.getAs[Long]("distinct_lb") <= trueDistinct)
    // collision-free width: the bounds become tight
    val tight = Sketch.cmStats(
      Sketch.cmSketchRows(keys, "k", depth = 3, width = 1 << 20)).head()
    assert(tight.getAs[Long]("hot_bound") === trueMax)
    assert(tight.getAs[Long]("distinct_lb") === trueDistinct)
  }

  test("cmJoinPlan picks broadcast/salt/shuffle on constructed shapes") {
    import spark.implicits._
    def sk(df: DataFrame) = Sketch.cmSketchRows(df, "k", 3, 1024)
    val small = spark.range(100).select(concat(lit("s"), col("id")).as("k"))
    val big = spark.range(20000)
      .select(concat(lit("s"), (col("id") % 5000)).as("k"))
    val skewed = spark.range(20000).select(
      when(col("id") % 2 === 0, lit("hot"))
        .otherwise(concat(lit("u"), col("id"))).as("k"))
    assert(Sketch.cmJoinPlan(sk(small), sk(big), broadcastRows = 1000)
      .head().getAs[String]("strategy") === "broadcast_a")
    assert(Sketch.cmJoinPlan(sk(big), sk(small), broadcastRows = 1000)
      .head().getAs[String]("strategy") === "broadcast_b")
    assert(Sketch.cmJoinPlan(sk(big), sk(big), broadcastRows = 1000)
      .head().getAs[String]("strategy") === "shuffle")
    assert(Sketch.cmJoinPlan(sk(big), sk(skewed), broadcastRows = 1000)
      .head().getAs[String]("strategy") === "shuffle_salted")
  }

  test("CM retraction: subtracting an ingested shard equals never having seen it") {
    val root = java.nio.file.Files
      .createTempDirectory("cmretract").toString + "/sk"
    val all = ordersKeys.localCheckpoint(false)
    val base = all.filter(col("k") % 2 === 0)
    val s1 = all.filter(col("k") % 2 === 1)
    Sketch.buildCmStore(base, "k", root, depth = 3, width = 256)
    assert(Sketch.upsertCm(s1, "k", root, "s1"))
    assert(Sketch.retractCm(s1, "k", root, "s1"))
    // retracting twice, or a shard never ingested, refuses as no-op
    assert(!Sketch.retractCm(s1, "k", root, "s1"))
    assert(!Sketch.retractCm(base, "k", root, "ghost"))
    def nz(m: Map[(Int, Long), Long]) = m.filter(_._2 > 0)
    val stored = graft.offline.VersionedStore.read(spark, root + "/cm_sketch")
      .collect().map(r => (r.getAs[Int]("di"), r.getAs[Long]("pos")) ->
        r.getAs[Long]("cnt")).toMap
    val baseOnly = Sketch.cmSketchRows(base, "k", depth = 3, width = 256)
      .collect().map(r => (r.getAs[Int]("di"), r.getAs[Long]("pos")) ->
        r.getAs[Long]("cnt")).toMap
    assert(nz(stored) === nz(baseOnly),
      "post-retraction cells must equal the base-only sketch")
    assert(stored.values.forall(_ >= 0L), "no negative cells")
    // estimates and exact bounds read identically to base-only
    val probes = base.distinct().select(col("k").as("probe_key"))
    val afterRetract = Sketch.readCmEstimates(spark, root, probes, "probe_key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val baseEst = Sketch.cmPointEstimate(
        Sketch.cmSketchRows(base, "k", depth = 3, width = 256),
        probes, "probe_key", depth = 3, width = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(afterRetract === baseEst)
    val st = Sketch.cmStats(
      graft.offline.VersionedStore.read(spark, root + "/cm_sketch")).head()
    val stBase = Sketch.cmStats(
      Sketch.cmSketchRows(base, "k", depth = 3, width = 256)).head()
    assert(st.getAs[Long]("n_rows") === stBase.getAs[Long]("n_rows"))
    assert(st.getAs[Long]("distinct_lb") === stBase.getAs[Long]("distinct_lb"),
      "zero-count residue must not inflate distinct_lb")
    // generation counting: the retracted shard may lawfully re-ingest,
    // and a second retraction of the new generation works too
    assert(Sketch.upsertCm(s1, "k", root, "s1"),
      "a completed retraction must allow re-ingest of the same id")
    val reinstated = graft.offline.VersionedStore
      .read(spark, root + "/cm_sketch")
      .collect().map(r => (r.getAs[Int]("di"), r.getAs[Long]("pos")) ->
        r.getAs[Long]("cnt")).toMap
    val full = Sketch.cmSketchRows(all, "k", depth = 3, width = 256)
      .collect().map(r => (r.getAs[Int]("di"), r.getAs[Long]("pos")) ->
        r.getAs[Long]("cnt")).toMap
    assert(nz(reinstated) === nz(full))
    assert(Sketch.retractCm(s1, "k", root, "s1"))
    // reserved verb: ingest refuses ids that could poison retraction
    intercept[IllegalArgumentException] {
      Sketch.upsertCm(s1, "k", root, "retract:evil")
    }
  }

  test("cm store ingest is exactly-once: a crashed replay never double-counts") {
    val root = java.nio.file.Files
      .createTempDirectory("cmcrash").toString + "/cm"
    val base = Seq("a", "b", "c").toDF("k")
    Sketch.buildCmStore(base, "k", root, depth = 3, width = 64)
    val shard = Seq("a", "a", "d").toDF("k")
    def mass(): Long = graft.offline.VersionedStore
      .read(spark, root + "/cm_sketch").filter(col("di") === 0)
      .agg(org.apache.spark.sql.functions.sum("cnt")).head().getLong(0)
    val m0 = mass()
    assert(Sketch.upsertCm(shard, "k", root, "s1"))
    val m1 = mass()
    assert(m1 === m0 + 3)
    // simulate the crash window: done row deleted, intent row stays
    graft.offline.VersionedStore.deleteKeys(
      Seq("s1").toDF("shard_id"), root + "/cm_applied", Seq("shard_id"))
    assert(Sketch.upsertCm(shard, "k", root, "s1"),
      "replay must FINISH the crashed ingest")
    assert(mass() === m1, "crashed replay must not double-count")
    assert(!Sketch.upsertCm(shard, "k", root, "s1"))
    assert(mass() === m1)
  }

  test("StreamingCm: micro-batches fold cells additively, exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files
      .createTempDirectory("cmstream").toString + "/sk"
    val base = Seq("alpha", "beta", "alpha").toDF("k")
    Sketch.buildCmStore(base, "k", root, depth = 3, width = 256)
    val in = MemoryStream[String]
    val q = graft.streaming.StreamingCm.start(
      in.toDS().toDF("k"), "k", root,
      java.nio.file.Files.createTempDirectory("cmstream_ck").toString)
    val b1 = Seq("alpha", "gamma")
    val b2 = (1 to 300).map(i => s"key${i % 40}")
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val stored = graft.offline.VersionedStore
      .read(spark, root + "/cm_sketch")
      .collect().map(r => (r.getAs[Int]("di"), r.getAs[Long]("pos")) ->
        r.getAs[Long]("cnt")).toMap
    val direct = Sketch.cmSketchRows(
        base.unionByName(b1.toDF("k")).unionByName(b2.toDF("k")),
        "k", depth = 3, width = 256)
      .collect().map(r => (r.getAs[Int]("di"), r.getAs[Long]("pos")) ->
        r.getAs[Long]("cnt")).toMap
    assert(stored === direct, "streamed cells must equal batch counts")
  }

  test("StreamingKn: micro-batches fold bigram counts; store freeze == batch freeze") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files
      .createTempDirectory("knstream").toString + "/kn"
    val base = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    TextAnalysis.knBuildStore(base, "doc_id", "text", root)
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingKn.start(
      in.toDS().toDF("doc_id", "text"), "doc_id", "text", root,
      java.nio.file.Files.createTempDirectory("knstream_ck").toString)
    val b1 = Seq((10L, "a b c d"), (11L, "b c"))
    val b2 = Seq((20L, "c a b"), (21L, "d d d"))
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val all = base.unionByName(b1.toDF("doc_id", "text"))
      .unionByName(b2.toDF("doc_id", "text"))
    val stored = graft.offline.VersionedStore.read(spark, root + "/kn_c12")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val direct = TextAnalysis.knBigramCounts(all, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(stored === direct, "streamed counts must equal batch counts")
    // and the artifact derived from streamed state == corpus freeze
    assert(TextAnalysis.knFreezeFromStore(spark, root).asMap ===
      TextAnalysis.knFreeze(all, "doc_id", "text").asMap)
  }

  test("StreamingKmv: micro-batches re-trim bottom-k exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files
      .createTempDirectory("kmvstream").toString + "/sk"
    val base = Seq(("src0", "alpha"), ("src1", "beta")).toDF("slice", "k")
    Sketch.buildKmvStore(base, "k", "slice", root, k = 16)
    val in = MemoryStream[(String, String)]
    val q = graft.streaming.StreamingKmv.start(
      in.toDS().toDF("slice", "k"), "k", "slice", root,
      java.nio.file.Files.createTempDirectory("kmvstream_ck").toString)
    val b1 = (1 to 40).map(i => ("src0", s"x$i"))
    val b2 = (1 to 40).map(i => ("src1", s"x$i")) // overlaps src0
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val stored = graft.offline.VersionedStore
      .read(spark, root + "/kmv_sketches").select("slice", "h")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val direct = Sketch.kmvSketchRows(
        base.unionByName(b1.toDF("slice", "k"))
          .unionByName(b2.toDF("slice", "k")), "k", "slice", k = 16)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(stored === direct, "streamed bottom-k must equal batch")
    // overlap read sees the streamed shared keys
    val ov = Sketch.readOverlap(spark, root)
      .filter(col("slice_a") === "src0" && col("slice_b") === "src1")
      .head().getDouble(2)
    assert(ov > 0.0, "streamed slices share 40 keys — overlap must show")
  }

  test("StreamingQuantile: micro-batches fold samples exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files
      .createTempDirectory("qstream").toString + "/sk"
    val base = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 5.0, 3L))
      .toDF("slice", "v", "id")
    Sketch.buildQuantileStore(base, "v", "id", "slice", root, k = 32)
    val in = MemoryStream[(String, Double, Long)]
    val q = graft.streaming.StreamingQuantile.start(
      in.toDS().toDF("slice", "v", "id"), "v", "id", "slice", root,
      java.nio.file.Files.createTempDirectory("qstream_ck").toString)
    val b1 = (10 to 60).map(i => ("a", i.toDouble, i.toLong))
    val b2 = (100 to 140).map(i => ("b", i.toDouble, i.toLong))
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val stored = graft.offline.VersionedStore
      .read(spark, root + "/quantile_sample")
      .select("slice", "v", "h").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    val direct = Sketch.quantileSampleRows(
        base.unionByName(b1.toDF("slice", "v", "id"))
          .unionByName(b2.toDF("slice", "v", "id")),
        "v", "id", "slice", k = 32).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    assert(stored === direct, "streamed sample must equal batch bottom-k")
  }

  // -----------------------------------------------------------------
  // Persisted quantile samples
  // -----------------------------------------------------------------

  test("quantile store: shard upserts equal the direct bottom-k; reads match the live sketch") {
    val root = java.nio.file.Files
      .createTempDirectory("qstore").toString + "/sk"
    val all = Tables.events(spark, sf).localCheckpoint(false)
    val base = all.filter(col("event_id") % 3 === 0)
    val s1 = all.filter(col("event_id") % 3 === 1)
    val s2 = all.filter(col("event_id") % 3 === 2)
    Sketch.buildQuantileStore(base, "value", "event_id", "event_type",
      root, k = 64)
    assert(Sketch.upsertQuantileSample(s1, "value", "event_id",
      "event_type", root, "s1"))
    assert(Sketch.upsertQuantileSample(s2, "value", "event_id",
      "event_type", root, "s2"))
    assert(!Sketch.upsertQuantileSample(s1, "value", "event_id",
      "event_type", root, "s1"), "replayed shard must no-op")
    val stored = graft.offline.VersionedStore
      .read(spark, root + "/quantile_sample")
      .select("slice", "v", "h").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    val direct = Sketch.quantileSampleRows(all, "value", "event_id",
        "event_type", k = 64).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    assert(stored === direct, "shard-folded bottom-k must equal direct")
    // quantile read from the store == the live sketch's sample half
    val fromStore = Sketch.readQuantiles(spark, root, Seq(0.5, 0.95))
      .collect().map(r => r.getAs[String]("slice") ->
        (r.getAs[Long]("n_sample"), r.getAs[Double]("p50_sample"),
          r.getAs[Double]("p95_sample"))).toMap
    val live = Sketch.quantileSketch(all, "value", "event_id",
        Seq("event_type"), k = 64, qs = Seq(0.5, 0.95))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_sample"), r.getAs[Double]("p50_sample"),
          r.getAs[Double]("p95_sample"))).toMap
    assert(fromStore === live)
  }
}
