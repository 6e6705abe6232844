package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.offline.OfflineStore
import graft.operators.{Ann, AsofJoin, Dedup, FeatureEng, Sessionize, TextAnalysis}

/** Synthetic scale-up probe: replicates the sf0.1 tables K× (ids
  * shifted so keys stay unique where they must) and times the
  * operators whose cost curves matter most. Evidence that the plans
  * hold past bench scale — not a substitute for a real cluster, but
  * it catches anything super-linear early.
  */
object ScaleProbe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scale] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def replicate(df: DataFrame, k: Int, idCols: Map[String, Long]): DataFrame =
    (0 until k).map { i =>
      idCols.foldLeft(df) { case (d, (c, stride)) =>
        d.withColumn(c, col(c) + lit(i * stride))
      }
    }.reduce(_ unionByName _)

  // ---- Zipfian tokenizer-training corpus ------------------------------
  // A natural-language-shaped synthetic vocabulary: words are 1-4
  // pronounceable syllables (onset+nucleus+coda), frequent ranks get
  // SHORTER words (Zipf's law of abbreviation), and word frequency
  // follows ~1/rank with a floor. This is the realistic counterpart
  // of the compound-bigram probe corpus (worst case for batching:
  // tiny base vocabulary, every pair sharing neighbors) — here
  // thousands of words share syllable prefixes/suffixes but the top
  // pairs are largely DISJOINT, the shape real tokenizer training
  // sees. Fully deterministic (hash-mixed, no RNG state).
  private val zOnsets = Array("b", "br", "ch", "d", "dr", "f", "g",
    "gr", "h", "k", "l", "m", "n", "p", "pr", "r", "s", "sh", "st",
    "t", "th", "tr", "v", "w", "y", "z")
  private val zNuclei = Array("a", "e", "i", "o", "u", "ai", "ea",
    "ie", "ou", "oo")
  private val zCodas = Array("", "", "n", "r", "s", "t", "l", "m",
    "d", "ck", "st", "nd", "ng", "sh")

  def zipfVocab(n: Int): IndexedSeq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    var salt = 0
    while (seen.size < n) {
      val r = seen.size
      var h = scala.util.hashing.MurmurHash3.productHash((r, salt))
      def next(m: Int): Int = {
        h = h * 0x9E3779B1 + 0x85EBCA77
        math.floorMod(h >> 4, m)
      }
      val nSyl =
        if (r < 200) 1 + next(2)
        else if (r < 5000) 2 + next(2)
        else 2 + next(3)
      val sb = new StringBuilder
      var i = 0
      while (i < nSyl) {
        sb ++= zOnsets(next(zOnsets.length))
        sb ++= zNuclei(next(zNuclei.length))
        sb ++= zCodas(next(zCodas.length))
        i += 1
      }
      if (!seen.add(sb.toString)) salt += 1
    }
    seen.toIndexedSeq
  }

  /** One corpus row per ≤512-token chunk of each word's Zipfian
    * repetition count — the trainer re-derives the word-count table
    * by grouping, so only vocabulary and counts matter, not layout. */
  def zipfCorpus(spark: SparkSession, nVocab: Int,
                 freqScale: Long = 300000L): DataFrame = {
    import spark.implicits._
    val rows = zipfVocab(nVocab).zipWithIndex.flatMap { case (w, r) =>
      val cnt = math.max(2L, freqScale / (r + 3))
      (0L until (cnt + 511) / 512).map { c =>
        val k = math.min(512L, cnt - c * 512).toInt
        (r.toLong * 100000L + c, Array.fill(k)(w).mkString(" "))
      }
    }
    spark.createDataset(rows).toDF("doc_id", "text")
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    // optional third arg: comma-separated section filter out of
    // events,orders,docs,emb — lets a single section re-run during
    // iteration without paying the full probe
    val sections = args.lift(2).map(_.split(",").toSet)
      .getOrElse(Set("events", "orders", "docs", "emb", "bpe", "crawl",
        "sketch", "graph", "cmstore"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // events xK: new users per replica (entity cardinality grows with
    // data — the realistic 100 TB shape), unique event ids
    if (sections("events")) {
    val ev = replicate(Tables.events(spark, d), k,
      Map("event_id" -> 10000000L, "user_id" -> 100000L)).cache()
    println(s"[scale] events rows: ${ev.count()}  (k=$k)")

    val features = ev.filter(col("event_type") =!= "purchase").select(
      col("user_id").cast("string").as("entity_id"), col("ts"),
      col("event_type").as("feature_name"), col("value").as("value_float"))
    val labels = ev.filter(col("event_type") === "purchase").select(
      col("user_id").cast("string").as("entity_id"), col("ts"),
      col("event_id"), col("value"))
    time("asof_join xK")(AsofJoin.pointInTime(features, labels,
      "entity_id", "ts", "feature_name", "value_float", "event_id", "value",
      Seq("click", "view", "error", "signup"), 0.0).count())

    val records = ev.select(lit("user").as("entity_type"),
      col("user_id").cast("string").as("entity_id"),
      col("event_type").as("feature_name"), col("value").as("value_float"),
      col("ts").as("event_time"), col("event_id").as("commit_id"))
    time("materialize xK")(OfflineStore.materializeVectors(records,
      Seq("click", "view", "error", "signup", "purchase"), 0.0).count())
    time("sessionize xK")(Sessionize.sessions(ev, "user_id", "ts", "value",
      7200L).count())
    // point-read serving at xK: publish the materialized snapshot
    // bucket-sorted, then a 100-key multi-get — warm serve cost should
    // track the key batch (pruned files), not the snapshot size
    val vectors = OfflineStore.materializeVectors(records,
      Seq("click", "view", "error", "signup", "purchase"), 0.0)
    val snapRoot = java.nio.file.Files
      .createTempDirectory("probe_snap").toString + "/snap"
    time("serving publish xK (256 buckets)")(
      graft.online.OnlineStore.publishSnapshot(vectors, snapRoot,
        "entity_id", nBuckets = 256, numFiles = 64))
    val keyBatch = vectors.select("entity_id").limit(100).cache()
    keyBatch.count()
    time("serving pointLookup 100 keys")(
      graft.online.OnlineStore.pointLookup(spark, snapRoot, keyBatch)
        .count())
    time("serving pointLookup 100 keys (2nd)")(
      graft.online.OnlineStore.pointLookup(spark, snapRoot, keyBatch)
        .count())
    keyBatch.unpersist()
    ev.unpersist()
    }

    if (sections("orders")) {
    // orders xK: new customers per replica — exercises the exact
    // global-rank path (literal-pinned quantile buckets + per-bucket
    // windows); watch for any single-task window stage
    val ord = replicate(Tables.orders(spark, d), k,
      Map("o_orderkey" -> 100000000L, "o_custkey" -> 10000000L)).cache()
    println(s"[scale] orders rows: ${ord.count()}")
    time("quantile_label xK")(FeatureEng.quantileLabel(
      ord, "o_custkey", "o_totalprice", 0.9).count())
    ord.unpersist()
    }

    if (sections("docs")) {
    // documents xK: unique doc ids, same text → every doc gains k-1
    // exact near-dups (worst-case pair pressure on the dedup joins)
    val docs = replicate(Tables.documents(spark, d), k,
      Map("doc_id" -> 1000000L)).cache()
    println(s"[scale] documents rows: ${docs.count()}")
    time("minhash xK")(Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4).count())
    time("simhash xK")(Dedup.simhashPairs(docs, "doc_id", "text", 6).count())
    time("simhash wide (128-bit) xK")(
      Dedup.simhashPairsWide(docs, "doc_id", "text", 6, words = 2).count())
    time("ngram xK (declared maxDf=100)")(
      Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.8, maxDf = 100).count())
    // ExactSubstr on the replicated corpus is the WORST duplication
    // case — (k-1)/k of all positions are duplicated (every replica
    // fully repeats its original) — yet the window-shaped plan's work
    // stays ∝ positions: per-gram df is k×, never k² pair rows. The
    // x1/xK pair below is the linearity evidence.
    time("exact-substr spans x1")(
      Dedup.exactSubstrSpans(Tables.documents(spark, d), "doc_id",
        "text", 3, 8).count())
    time("exact-substr spans xK (every gram df>=k)")(
      Dedup.exactSubstrSpans(docs, "doc_id", "text", 3, 8).count())
    time("exact-substr dedup ACTION xK")(
      Dedup.exactSubstrDedup(docs, "doc_id", "text", 3, 8).count())
    // production order: exact dedup FIRST collapses identical copies
    // (k replicas → 1 canonical) before the quadratic-in-dup-cluster
    // pair join — the inverted index then only sees distinct content.
    time("ngram after exact-dedup")({
      val canonical = docs.withColumn("h", md5(col("text")))
        .groupBy("h").agg(min(col("doc_id")).as("doc_id"),
          first(col("text")).as("text"))
      Dedup.ngramJaccard(canonical, "doc_id", "text", 3, 0.8).count()
    })
    // substring spans: positional-shingle fan-out is df² like ngram;
    // the dup-bomb multiplies occurrence df 10x, so the cap carries it
    time("overlap spans xK (maxDf=100)")(
      Dedup.overlapSpans(docs, "doc_id", "text", 3, 8, maxDf = 100).count())
    // the strip ACTION end-to-end: per-doc cut lists are bounded by
    // partner count x spans/pair — confirm no per-doc blowup when
    // every doc has k-1 full-length dup partners (worst case: each
    // doc's whole text is one giant merged cut)
    // NOT .count(): the strip output is docs LEFT JOIN an aggregated
    // cut list, which Catalyst's join elimination would reduce to
    // docs.count() — aggregate over text_clean forces the whole strip
    time("strip spans xK (maxDf=100)")({
      val spans = Dedup.overlapSpans(docs, "doc_id", "text", 3, 8,
        maxDf = 100)
      Dedup.stripSpans(docs, "doc_id", "text", spans)
        .agg(sum(length(col("text_clean")))).head()
    })
    // the packaged pipeline: exact -> minhash candidates -> exact verify
    time("Dedup.pipeline xK")(
      Dedup.pipeline(docs, "doc_id", "text", 3, 0.8).count())
    time("tfidf xK")(
      TextAnalysis.tfidf(docs, "doc_id", "text", 5).count())
    time("pack_sequences xK")(
      FeatureEng.packSequences(docs, "doc_id", "text", 1024L).count())
    // repeated-line removal under the dup-bomb: every line's df is
    // multiplied k-fold AND a corpus-wide boilerplate line is
    // injected, so the frequent set catches both the footer and every
    // replicated content line — worst-case cut volume. Aggregate over
    // text_clean (takeaway 13: a count() would be join-eliminated).
    time("line dedup xK")({
      val ml = docs.select(col("doc_id"), concat_ws("\n",
        col("text"), lit("subscribe to our newsletter today"),
        concat(lit("doc "), col("doc_id").cast("string"))).as("text"))
      Dedup.lineDedup(ml, "doc_id", "text", maxDf = 10, minChars = 5)
        .agg(sum(length(col("text_clean")))).head()
    })
    // PII redaction: pure projection — the probe just confirms it
    // stays scan-shaped at xK (no shuffle can appear by accident)
    time("redact pii xK")({
      val pd = docs.select(col("doc_id"), concat(col("text"),
        lit(" user"), col("doc_id").cast("string"),
        lit("@example.com 10.0.0.7 555-123-4567 acct 9876543210"))
        .as("text"))
      TextAnalysis.redactPii(pd, "doc_id", "text")
        .agg(sum(length(col("text_redacted")))).head()
    })
    // winnowing pairs under the dup-bomb: k replicas of every doc
    // share ALL fingerprints, so pair pressure is k² per content
    // cluster on 1/w-density fps — the honest stress for the capped
    // inverted-index join
    time("winnow pairs xK (maxDf=100)")(
      Dedup.winnowPairs(docs, "doc_id", "text", 5, 4, 2L, 100L).count())
    // training-order shuffle: one shuffle + per-shard window
    // numbering; aggregate over shard_pos so column pruning can't
    // drop the window (takeaway 13)
    time("shuffle shard xK (256 shards)")(
      FeatureEng.shuffleShard(docs, "doc_id", 256)
        .agg(sum(col("shard_pos"))).head())
    // DSIR: the gram explode+agg is linear in tokens and the model
    // tables are bucket-bounded (10k rows, broadcast) — under the
    // dup-bomb every bucket count scales k-fold but table SIZE is
    // flat, so end-to-end must track corpus size, never pairs
    time("dsir weights + top-100 xK")({
      val w = graft.operators.Dsir.importanceWeights(docs, "doc_id",
        "text", col("source").isin("src0", "src1"), 10000, 1.0)
      graft.operators.Dsir.resample(w, 100).count()
    })
    // persisted DSIR store: build cost is corpus-shaped (one explode
    // + bucket agg); the shard upsert and the freeze must be SHARD-
    // and BUCKET-shaped respectively — a daily refresh pays neither
    // a corpus rescan nor a corpus-sized read
    val dsroot = java.nio.file.Files
      .createTempDirectory("probe_dsir").toString + "/model"
    time("dsir store build xK")(
      graft.operators.Dsir.buildModelStore(docs, "doc_id", "text",
        col("source").isin("src0", "src1"), dsroot))
    time("dsir store upsert 50 docs")(
      graft.operators.Dsir.upsertModelCounts(
        docs.filter(col("doc_id") % 997 === 0).limit(50),
        "doc_id", "text", col("source").isin("src0", "src1"),
        dsroot, "probe-shard"))
    time("dsir store freeze")(
      graft.operators.Dsir.freezeFromStore(spark, dsroot))
    // soft quality sampling: codegen filter over the quality frame —
    // confirm it stays scan-shaped (the filter forces the scores)
    time("quality-weighted sample xK")(
      FeatureEng.weightedSample(
        TextAnalysis.quality(docs, "doc_id", "text"), "doc_id",
        col("quality_score")).count())
    // frozen decontamination: freeze a benchmark-sized eval slice,
    // then the one-pass hash-set probe over the dup-bombed corpus
    time("decontaminate frozen xK")({
      val frozen = Dedup.freezeEvalShingles(
        docs.filter(col("doc_id") % 997 === 0), "text", 3)
      Dedup.decontaminateFrozen(docs, "doc_id", "text", frozen, 3)
        .agg(sum(col("n_overlap"))).head()
    })
    // incremental dedup: init state from 90% of the corpus, then
    // dedup a 10% shard against it — the shard cost is what a daily
    // ingest pays, and it must be shard-shaped, not corpus-shaped
    val dstate = java.nio.file.Files
      .createTempDirectory("probe_dstate").toString + "/state"
    val bulk = docs.filter(col("doc_id") % 10 =!= 0)
    val shard = docs.filter(col("doc_id") % 10 === 0)
    time("dedup state init (90% corpus)")(
      Dedup.dedupIncremental(bulk, "doc_id", "text", dstate, 3, 0.8)
        .count())
    time("dedup incremental shard (10%)")(
      Dedup.dedupIncremental(shard, "doc_id", "text", dstate, 3, 0.8)
        .count())
    // micro-shard fast path: key-sort the state, then a 50-doc batch
    // full-scan vs pruned — the pruned read must be batch-shaped, not
    // state-shaped. Two disjoint fresh-id batches (registration
    // mutates state between the runs).
    val microBase = Tables.documents(spark, d).limit(100).cache()
    microBase.count()
    val micro1 = microBase.filter(col("doc_id") % 2 === 0)
      .withColumn("doc_id", col("doc_id") + lit(100000000L))
    val micro2 = microBase.filter(col("doc_id") % 2 === 1)
      .withColumn("doc_id", col("doc_id") + lit(200000000L))
    time("compact dedup state (key-sorted)")(
      Dedup.compactDedupState(spark, dstate, numFiles = 64))
    time("micro-shard 50 docs, full scan")(
      Dedup.dedupIncremental(micro1, "doc_id", "text", dstate, 3, 0.8)
        .count())
    time("micro-shard 50 docs, pruned")(
      Dedup.dedupIncremental(micro2, "doc_id", "text", dstate, 3, 0.8,
        pruneStateDocs = 10000).count())
    microBase.unpersist()
    // novelty: inverted-index df + probe join — must stay linear in
    // total shingles even when the dup-bomb pushes every df to k
    time("novelty xK")(
      TextAnalysis.novelty(docs, "doc_id", "text", 3).count())
    // the packaged end-to-end curation pipeline under the dup-bomb:
    // quality signals + line dedup + Dedup.pipeline + decontam vs a
    // 10% eval slice; aggregate over text forces the reassembly
    // (takeaway 13 — count() would prune it)
    // lineMaxDf above the replication factor: the dup-bomb gives every
    // content line df = k, and a cap at-or-below k would boilerplate-
    // cut the whole corpus — the dedup stage, not the line stage, must
    // absorb full-document duplication
    time("curate end-to-end xK")({
      val eval = Tables.documents(spark, d).filter(col("doc_id") % 10 === 0)
      graft.operators.Curate.corpus(docs, "doc_id", "text", Some(eval),
          graft.operators.Curate.CurateConfig(lineMaxDf = 50))
        .agg(sum(length(col("text")))).head()
    })
    // near-dup graph -> connected components (pointer-jump propagation)
    time("clusters over minhash pairs xK")({
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4)
        .select("doc_a", "doc_b")
      Dedup.clusters(pairs).count()
    })
    // the keep-best ACTION on the same pair graph: clusters + scoring
    // + per-cluster argmax window + broadcast anti-join — the window
    // partitions are dup clusters (size k here), never the corpus
    time("keepBest over minhash pairs xK")({
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4)
        .select("doc_a", "doc_b")
      Dedup.keepBest(docs, "doc_id", pairs, length(col("text"))).count()
    })
    // leakage-free split: outer join + projection — count() would
    // join-eliminate (takeaway 13), so aggregate a produced column
    time("clusterSplit over minhash pairs xK")({
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4)
        .select("doc_a", "doc_b")
      Dedup.clusterSplit(docs, "doc_id", pairs, 80)
        .agg(sum(length(col("split")))).head()
    })
    // BM25 retrieval: the batch scorer is corpus-linear (one tokenize
    // pass + query-broadcast joins); the persisted index's serve must
    // be TERM-shaped (file-pruned posting read), and the upsert
    // SHARD-shaped — the dup-bomb multiplies every df k-fold but the
    // query-vocabulary restriction keeps the matched stream bounded
    val bmQueries = Tables.documents(spark, d)
      .filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("q_id"),
        array_join(slice(split(col("text"), " "), 1, 8), " ").as("q_text"))
      .cache()
    println(s"[scale] bm25 query batch: ${bmQueries.count()}")
    time("bm25 batch topk xK")(
      graft.operators.Search.bm25TopK(docs, "doc_id", "text",
        bmQueries, "q_id", "q_text", k = 10).count())
    val bmRoot = java.nio.file.Files
      .createTempDirectory("probe_bm25").toString + "/idx"
    time("bm25 index build xK")(
      graft.operators.Search.buildTextIndex(spark, docs, "doc_id",
        "text", bmRoot, nFiles = 64))
    time("bm25 serve cold")(
      graft.operators.Search.serveBm25(spark, bmRoot, bmQueries,
        "q_id", "q_text", k = 10).count())
    time("bm25 serve warm")(
      graft.operators.Search.serveBm25(spark, bmRoot, bmQueries,
        "q_id", "q_text", k = 10).count())
    // the collect-free bulk path on the same 1%-slice batch: its win
    // is removing the driver collect, so its cost should track the
    // serve path's (the 31-word synthetic vocabulary makes both
    // worst-case — every posting matches; see SCALE_NOTES). Runs
    // BEFORE the upsert so the serve/bulk rows read the same
    // freshly-compacted layout.
    time("bm25 bulk (1% slice) xK")(
      graft.operators.Search.bm25TopKFromIndex(spark, bmRoot,
        bmQueries, "q_id", "q_text", k = 10).count())
    time("bm25 index upsert 50 docs")(
      graft.operators.Search.indexUpsert(spark,
        Tables.documents(spark, d).limit(50)
          .withColumn("doc_id", col("doc_id") + lit(300000000L)),
        "doc_id", "text", bmRoot))
    // retraction at xK: the tombstone write + stats recompute must be
    // delete-batch-shaped (never a posting rewrite); the tombstoned
    // serve pays one small anti-join; the sweep rides a compaction
    time("bm25 delete 1% of docs")(
      graft.operators.Search.indexDelete(spark,
        docs.filter(col("doc_id") % 100 === 7).select("doc_id"),
        "doc_id", bmRoot))
    time("bm25 serve after delete (tombstoned)")(
      graft.operators.Search.serveBm25(spark, bmRoot, bmQueries,
        "q_id", "q_text", k = 10).count())
    time("bm25 compact+sweep")(
      graft.operators.Search.compactTextIndex(spark, bmRoot))
    time("bm25 serve after sweep")(
      graft.operators.Search.serveBm25(spark, bmRoot, bmQueries,
        "q_id", "q_text", k = 10).count())
    // cosine + fusion: the cosine leg re-pays the tokenize/df work,
    // fusion itself is query-shaped (two exchanges over top-k rows)
    time("tfidf cosine topk xK")(
      graft.operators.Search.tfidfCosineTopK(docs, "doc_id", "text",
        bmQueries, "q_id", "q_text", k = 10).count())
    time("hybrid rrf (bm25+cosine) xK")({
      val r1 = graft.operators.Search.bm25TopK(docs, "doc_id", "text",
        bmQueries, "q_id", "q_text", k = 10)
      val r2 = graft.operators.Search.tfidfCosineTopK(docs, "doc_id",
        "text", bmQueries, "q_id", "q_text", k = 10)
      graft.operators.Search.rrfFuse(Seq(r1, r2), k = 10).count()
    })
    bmQueries.unpersist()
    // BPE training: cost = one corpus tokenize + nMerges rounds over
    // the WORD table (vocab-sized). Under the dup-bomb the word table
    // is IDENTICAL to ×1 (replication changes counts, not vocabulary),
    // so training must be ~flat in k — the Heaps'-law shape
    val bpeM = time("bpe train 30 merges xK")(
      graft.operators.Bpe.train(docs, "doc_id", "text", nMerges = 30))
    // encode must time the lookup join ONLY — the train row above
    // already priced the model
    time("bpe encode xK")(
      graft.operators.Bpe.encode(docs, "doc_id", "text", bpeM)
        .agg(sum(size(col("pieces")))).head())
    docs.unpersist()
    }

    if (sections("bpe")) {
    // REALISTIC-VOCABULARY tokenizer training: the sequential trainer
    // pays ~2 jobs per merge (pair-count argmax + fold), a pure
    // scheduling floor that makes 32k merges hours of driver time.
    // The batched trainer (exact-batch acceptance rule, spec-held
    // equal to sequential) must show rounds << nMerges here — the
    // evidence the "flat in corpus size" claim extends to real vocab
    // sizes. Runs on the ×1 corpus: vocabulary, not volume, is the
    // variable under test.
    // the raw synthetic corpus has a 31-word vocabulary — only ~89
    // merges exist and every pair shares neighbors, the worst case
    // for exact batching. Derive a compound-word corpus (adjacent
    // word bigrams, ~960 distinct words with Zipf-ish counts and
    // ~10-char lengths) so the vocabulary under test is
    // realistic-shaped; same probe-derivation convention as the
    // dup-bomb and PII rows above.
    val bdocs = Tables.documents(spark, d)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("text", expr(
        "array_join(transform(sequence(0, greatest(size(ws) - 2, 0)), " +
          "i -> concat(ws[i], '-', ws[i + 1])), ' ')"))
      .filter(size(col("ws")) >= 2)
      .select("doc_id", "text").cache()
    println(s"[scale] bpe corpus rows: ${bdocs.count()}")
    val nM = args.lift(3).map(_.toInt).getOrElse(1000)
    val (bm, rounds) = time(s"bpe trainBatched $nM merges")(
      graft.operators.Bpe.trainBatched(bdocs, "doc_id", "text",
        nMerges = nM, minPairCount = 2L, maxBatch = 256))
    val got = bm.rules.count()
    println(s"[scale] bpe batched: $got merges in $rounds rounds " +
      f"(${got.toDouble / math.max(rounds, 1)}%.1f merges/round)")
    // sequential A/B at a size that terminates in minutes: the
    // per-merge floor extrapolates linearly (verified flat in r7)
    time("bpe train 100 merges (sequential)")(
      graft.operators.Bpe.train(bdocs, "doc_id", "text", nMerges = 100,
        minPairCount = 2L).rules.count())
    time("bpe trainBatched 100 merges")(
      graft.operators.Bpe.trainBatched(bdocs, "doc_id", "text",
        nMerges = 100, minPairCount = 2L, maxBatch = 256)._1.rules.count())
    bdocs.unpersist()
    }

    if (sections("substrstore")) {
    // The incremental-ExactSubstr claim end to end at xK: build the
    // gram store from the base corpus ONCE, then measure the daily
    // path — one shard ingested additively, a new shard detected
    // against everything so far with NO corpus rescan — versus the
    // from-scratch alternative (re-shingling base+shard every day).
    val base = replicate(Tables.documents(spark, d), k,
      Map("doc_id" -> 10000000L)).cache()
    println(s"[scale] substrstore base rows: ${base.count()}  (k=$k)")
    val sroot = java.nio.file.Files
      .createTempDirectory("substr_probe").toString + "/ss"
    time(s"substr store build x$k")(
      graft.operators.Dedup.buildSubstrStore(base, "doc_id", "text",
        sroot, n = 3))
    val shard1 = Tables.documents(spark, d)
      .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
      .cache()
    println(s"[scale] substrstore shard rows: ${shard1.count()}")
    time("substr shard upsert x1")(
      graft.operators.Dedup.upsertSubstrShard(shard1, "doc_id", "text",
        sroot, "day1"))
    val shard2 = Tables.documents(spark, d)
      .select((col("doc_id") + 910000000L).as("doc_id"), col("text"))
    time("substr incremental detect (store, no corpus scan)")(
      graft.operators.Dedup.substrSpansIncremental(shard2, "doc_id",
        "text", sroot, minTokens = 8).count())
    time("substr detect from scratch (re-shingle corpus+shard)")(
      graft.operators.Dedup.exactSubstrSpansAgainst(
        base.select("doc_id", "text").union(shard1), shard2,
        "doc_id", "text", n = 3, minTokens = 8).count())
    shard1.unpersist(); base.unpersist()
    }

    if (sections("unigram")) {
    // Unigram Viterbi-EM at a realistic vocabulary: the Zipfian
    // synthetic corpus (~8k distinct words) trains a 2k-piece vocab
    // in 3 EM rounds; each round is one pure-projection encode of
    // the distinct-word table + one vocab-sized groupBy, so the
    // variable under test is VOCABULARY, not corpus volume. The
    // encode linearity claim is probed separately: corpus ×1 vs ×K
    // through the SAME frozen model — a pure projection must scale
    // linearly with rows and be independent of duplicate structure.
    val nVocab = args.lift(3).map(_.toInt).getOrElse(8000)
    val udocs = zipfCorpus(spark, nVocab).cache()
    println(s"[scale] unigram corpus rows: ${udocs.count()}")
    val model = time("unigram train 2k vocab, 3 EM rounds")(
      graft.operators.Unigram.train(udocs, "doc_id", "text",
        vocabSize = 2000, maxPieceLen = 5, rounds = 3))
    println(s"[scale] unigram vocab: ${model.vocab.count()} pieces")
    val costs = graft.operators.Unigram.collectCosts(model.vocab)
    time("unigram encode x1")(
      graft.operators.Unigram.encodeDocs(udocs, "doc_id", "text",
        costs, 5).agg(sum("n_tokens")).head())
    val udocsK = replicate(udocs, k, Map("doc_id" -> 10000000L)).cache()
    println(s"[scale] unigram xK rows: ${udocsK.count()}")
    time(s"unigram encode x$k")(
      graft.operators.Unigram.encodeDocs(udocsK, "doc_id", "text",
        costs, 5).agg(sum("n_tokens")).head())
    udocsK.unpersist(); udocs.unpersist()
    }

    if (sections("pretrain")) {
    // The whole "docs in, training shards out" capstone chain
    // (quality gate → exact dedup → decontamination → token-budget
    // cut → unigram encode → boundary-aware packing) at ×1 vs ×K,
    // budget scaled with the corpus so output volume scales too —
    // the end-to-end linearity evidence for the round-11/12 capstone
    // family (each stage is probed alone elsewhere; this measures
    // the composition, including the stage-to-stage semi-joins).
    import graft.operators.{Bpe, Unigram}
    def chain(docs: DataFrame, budget: Long): Long = {
      val clean = TextAnalysis.cleanFilter(docs, "doc_id", "text",
        20, 100000, 2.0, 12.0, 0.3, 0.12)
      val sdocs = docs.join(
        clean.select("doc_id", "n_words", "quality_score"), "doc_id")
      val keep = Dedup.exact(sdocs, "doc_id", "text")
        .select(col("canonical_id").as("doc_id"))
      val dd = sdocs.join(keep, Seq("doc_id"), "left_semi")
      val evalDocs = docs.filter(col("doc_id") % 10 === 0)
      val pool = dd.filter(col("doc_id") % 10 =!= 0)
      val flagged = Dedup.decontaminationScores(pool, "doc_id",
          "text", evalDocs, "doc_id", "text", n = 3)
        .filter(col("contam_frac") >= 0.8)
      val train = pool.join(flagged.select("doc_id"), Seq("doc_id"),
        "left_anti")
      val sel = FeatureEng.selectToBudget(train, "doc_id",
        col("quality_score"), col("n_words"), budget)
      val chosen = docs.join(sel.select("doc_id"), Seq("doc_id"),
        "left_semi")
      val wc = Bpe.corpusWordCounts(docs, "doc_id", "text")
      val costs = Unigram.collectCosts(
        Unigram.integerCosts(Unigram.seedVocab(wc, 4, 64)))
      val enc = Unigram.encodeDocs(chosen, "doc_id", "text", costs, 4)
      FeatureEng.packSegments(enc, "doc_id", "n_tokens", 512L).count()
    }
    val p1 = Tables.documents(spark, d).cache()
    println(s"[scale] pretrain x1 docs: ${p1.count()}")
    val n1 = time("pretrain chain x1 (budget 200k)")(chain(p1, 200000L))
    val pK = replicate(Tables.documents(spark, d), k,
      Map("doc_id" -> 1000000L)).cache()
    println(s"[scale] pretrain x$k docs: ${pK.count()}")
    val nK = time(s"pretrain chain x$k (budget ${200000L * k})")(
      chain(pK, 200000L * k))
    println(s"[scale] pretrain segments: x1=$n1 x$k=$nK")
    p1.unpersist(); pK.unpersist()
    }

    // q_pretrain_mix's composition at ×1 vs ×K with PER-STAGE rows
    // and walls (r12 verdict #7): each stage's input should shrink
    // down the chain, and the DoReMi fit+MW-loop stage should stay
    // ~flat beyond its two corpus scans (the loop only touches the
    // domains-count table).
    if (sections("pretrainmix")) {
    import graft.operators.Doremi
    def mixChain(docs: DataFrame, budget: Long, tag: String): Unit = {
      val nDocs = docs.count()
      val clean = TextAnalysis.cleanFilter(docs, "doc_id", "text",
        20, 100000, 2.0, 12.0, 0.3, 0.12)
      val sdocs = docs.join(
        clean.select("doc_id", "n_words", "quality_score"), "doc_id")
        .cache()
      val nClean = time(s"mix[$tag] 1 quality gate")(sdocs.count())
      val keep = Dedup.exact(sdocs, "doc_id", "text")
        .select(col("canonical_id").as("doc_id"))
      val dd = sdocs.join(keep, Seq("doc_id"), "left_semi").cache()
      val nDd = time(s"mix[$tag] 2 exact dedup")(dd.count())
      val evalDocs = docs.filter(col("doc_id") % 10 === 0)
      val pool = dd.filter(col("doc_id") % 10 =!= 0)
      val flagged = Dedup.decontaminationScores(pool, "doc_id", "text",
          evalDocs, "doc_id", "text", n = 3)
        .filter(col("contam_frac") >= 0.8)
      val train = pool.join(flagged.select("doc_id"), Seq("doc_id"),
        "left_anti").cache()
      val nTrain = time(s"mix[$tag] 3 decontam")(train.count())
      val rates = time(s"mix[$tag] 4 doremi fit + rates") {
        val perSrc = Doremi
          .domainWeights(docs, "doc_id", "text", "source")
          .select(col("source"), col("n_tokens").as("src_tokens"),
            (col("share_micro") / lit(1000000.0)).as("share"))
        FeatureEng.mixRates(perSrc).cache().localCheckpoint(true)
      }
      val gated = FeatureEng.mixApply(
        train.select("doc_id", "n_words", "quality_score", "source"),
        rates, Seq("doc_id", "n_words", "quality_score")).cache()
      val nGated = time(s"mix[$tag] 5 learned-mix gate")(gated.count())
      val nSel = time(s"mix[$tag] 6 budget cut")(
        FeatureEng.selectToBudget(gated, "doc_id",
          col("quality_score"), col("n_words"), budget).count())
      println(s"[scale] mix[$tag] stage rows: docs=$nDocs " +
        s"clean=$nClean dedup=$nDd train=$nTrain gated=$nGated " +
        s"selected=$nSel")
      sdocs.unpersist(); dd.unpersist(); train.unpersist()
      gated.unpersist()
    }
    val m1 = Tables.documents(spark, d).cache(); m1.count()
    mixChain(m1, 20000L, "x1")
    val mK = replicate(Tables.documents(spark, d), k,
      Map("doc_id" -> 1000000L)).cache(); mK.count()
    mixChain(mK, 20000L * k, s"x$k")
    m1.unpersist(); mK.unpersist()
    }

    if (sections("ftpack")) {
    // Round-12 families. packSegments: pure arithmetic over the
    // distributed running total + a bounded explode — must be LINEAR
    // in docs (x1 vs xK through identical plans). FtClassify: the
    // train cost story is epochs × two aggregates over the SEED —
    // probe seed sizes x1/x4/x20 at fixed epochs to show per-epoch
    // cost is seed-bounded (the corpus-wide cost is the frozen
    // projection, measured by the bench row).
    val pdocs = replicate(Tables.documents(spark, d), k,
      Map("doc_id" -> 1000000L)).cache()
    println(s"[scale] ftpack documents rows: ${pdocs.count()}")
    val counts1 = Tables.documents(spark, d).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    val countsK = pdocs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    time("packSegments x1")(
      FeatureEng.packSegments(counts1, "doc_id", "n", 1024L).count())
    time(s"packSegments x$k")(
      FeatureEng.packSegments(countsK, "doc_id", "n", 1024L).count())
    time(s"packAttentionMasks x$k")(
      FeatureEng.packAttentionMasks(countsK, "doc_id", "n", 1024L)
        .count())
    def seedOf(mul: Int) = {
      val base = TextAnalysis.quality(
          Tables.documents(spark, d), "doc_id", "text")
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), (col("quality_score") >= 0.5).as("lbl"))
        .join(Tables.documents(spark, d).select("doc_id", "text"),
          "doc_id")
      replicate(base, mul, Map("doc_id" -> 1000000L)).cache()
    }
    for (mul <- Seq(1, 4, 20)) {
      val sd = seedOf(mul)
      val n = sd.count()
      time(s"ft train 10 epochs, seed=$n docs")(
        graft.operators.FtClassify.train(sd, "doc_id", "text", "lbl",
          nBuckets = 4096, dim = 8, epochs = 10, lrMicro = 16000000L))
      sd.unpersist()
    }
    pdocs.unpersist()
    }

    if (sections("hotgram")) {
    // HOT-GRAM straggler probe (round 12): one boilerplate line in
    // EVERY doc — each of its grams has df = nDocs (default 10M, the
    // ~10⁷-occurrence case the r11 verdict named). The round-11
    // window-shaped detector serializes all nDocs occurrences of each
    // hot gram through ONE window task; the round-12 aggregation
    // shape (groupBy + min(struct) join-back) map-side combines the
    // count and lets AQE split the join-back. Same answer (spec-held
    // equal); this probe measures the wall-clock gap at hot-df scale.
    // ONE hot gram (the verdict's exact construction): every doc
    // shares the single 3-gram "b0 b1 b2" and nothing else, so the
    // window shape must sort all nDocs occurrences of that gram in
    // ONE task (a window partition is indivisible), while the agg
    // shape's count/min combine map-side and its join-back spreads
    // over every partition. minTokens = n so the probe measures
    // detection, not span-length filtering.
    // The straggler metric is MAX TASK TIME, not wall (at probe scale
    // 32 local cores absorb one slow task; on a 1000-executor cluster
    // the job ends when the hot task does). Measured at two df scales:
    // the window shape's max task grows ∝ df (one task sorts every
    // occurrence), the agg shape's stays flat (map-side combine).
    def maxTask[T](name: String)(f: => T): Unit = {
      val maxMs = new java.util.concurrent.atomic.AtomicLong(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          maxMs.updateAndGet(m => math.max(m, te.taskInfo.duration))
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime(); f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // listener bus drain
      spark.sparkContext.removeSparkListener(l)
      println(f"[scale] $name%-44s wall ${wall}%7.2f s   max task ${maxMs.get / 1e3}%7.2f s")
    }
    // Corpus size FIXED (so per-task input volume is constant); only
    // the hot gram's df varies — every 10th doc vs every doc carries
    // the boilerplate. Any max-task growth is then the hot KEY, not
    // data volume.
    val nDocs = args.lift(3).map(_.toLong).getOrElse(30000000L)
    for (hotEvery <- Seq(10L, 1L)) {
      val df = nDocs / hotEvery
      val hot = spark.range(1, nDocs + 1).select(col("id").as("doc_id"),
        concat(
          when(col("id") % hotEvery === 0, lit("b0 b1 b2 u"))
            .otherwise(concat(lit("c"), col("id").cast("string"),
              lit("x c"), col("id").cast("string"), lit("y c"),
              col("id").cast("string"), lit("z u"))),
          col("id").cast("string"), lit("a u"),
          col("id").cast("string"), lit("b")).as("text")).cache()
      println(s"[scale] hotgram docs: ${hot.count()} (ONE gram at df=$df)")
      maxTask(s"exact-substr AGG shape, one gram df=$df")(
        Dedup.exactSubstrSpans(hot, "doc_id", "text", 3, 3).count())
      maxTask(s"exact-substr WINDOW shape, one gram df=$df")(
        Dedup.exactSubstrSpansWindowed(hot, "doc_id", "text", 3, 3).count())
      hot.unpersist()
    }
    }

    if (sections("hotstore")) {
    // Store-serve path under the same hot gram (r11 verdict item 6).
    // The round-12 serve shape joins the store on the PER-GRAM
    // aggregate (unique keys — unskewable) and joins the verdicts
    // back onto the occurrence stream. Two measured regimes:
    //  (a) defaults — gramInfo is shard-bounded and small, so AQE
    //      broadcasts the join-back at runtime: the stream's only
    //      s-shuffle is the map-side-combined aggregate (a hot gram
    //      collapses to one partial row per input partition). Expect
    //      BroadcastHashJoin in the final plan and a flat max task.
    //  (b) broadcast disabled (the gramInfo-too-big-to-broadcast
    //      fallback) — the SMJ chain pipelines into one stage, AQE's
    //      skew split cannot fire (no shuffle boundary between the
    //      chained joins), and the hot partition's sort is the
    //      straggler. Measured honestly; the mitigation at that scale
    //      is salting the join-back (Skew.saltedJoin).
    val nDocs = args.lift(3).map(_.toLong).getOrElse(10000000L)
    def maxTaskH[T](name: String)(f: => T): Unit = {
      val maxMs = new java.util.concurrent.atomic.AtomicLong(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          maxMs.updateAndGet(m => math.max(m, te.taskInfo.duration))
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime(); f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      spark.sparkContext.removeSparkListener(l)
      println(f"[scale] $name%-44s wall ${wall}%7.2f s   max task ${maxMs.get / 1e3}%7.2f s")
    }
    val sroot = java.nio.file.Files
      .createTempDirectory("hotstore_probe").toString + "/ss"
    time("hotstore build (base corpus)")(
      Dedup.buildSubstrStore(Tables.documents(spark, d)
        .select(col("doc_id"),
          concat(lit("b0 b1 b2 b3 b4 b5 b6 b7 b8 b9 "), col("text"))
            .as("text")),
        "doc_id", "text", sroot, n = 3))
    val shard = spark.range(1, nDocs + 1).select(
      (col("id") + 900000000L).as("doc_id"),
      concat(lit("b0 b1 b2 b3 b4 b5 b6 b7 b8 b9 u"),
        col("id").cast("string"), lit("a u"), col("id").cast("string"),
        lit("b")).as("text")).cache()
    println(s"[scale] hotstore shard docs: ${shard.count()}")
    for (bcast <- Seq(true, false)) {
      if (!bcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val served = Dedup.substrSpansIncremental(shard, "doc_id", "text",
        sroot, minTokens = 8)
      // execute THIS query execution's adaptive plan (a .count()
      // would plan and finalize a different QE)
      val qe = served.queryExecution
      maxTaskH(s"store serve, hot df=$nDocs, bcast=$bcast")(
        qe.executedPlan.execute().count())
      val finalPlan = qe.executedPlan.toString
      println(s"[scale] hotstore bcast=$bcast: join-back is " +
        (if (finalPlan.contains("BroadcastHashJoin")) "BroadcastHashJoin"
        else "SortMergeJoin") +
        s", AQE skew marker present: ${finalPlan.contains("skew=true")}")
      if (!bcast)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    shard.unpersist()
    }

    if (sections("bpezipf")) {
    // ZIPFIAN-VOCABULARY deep training: the compound-corpus probe
    // above measures batching on a worst-case vocabulary; this one
    // answers the open question "does merges/round hold (or rise) on
    // a natural Zipfian vocabulary, at real vocab sizes?" — ≥20k
    // distinct words, ≥5k merges, milestone wall-times printed every
    // 500 merges so the per-merge cost curve is visible.
    val nVocab = args.lift(3).map(_.toInt).getOrElse(25000)
    val nM = args.lift(4).map(_.toInt).getOrElse(5000)
    val zdocs = zipfCorpus(spark, nVocab).cache()
    val toks = zdocs.select(sum(size(split(col("text"), " "))))
      .head().getLong(0)
    println(s"[scale] zipf corpus: $nVocab distinct words, $toks tokens")
    val t0 = System.nanoTime()
    var lastMile = 0
    val (zm, zrounds) = graft.operators.Bpe.trainBatched(
      zdocs, "doc_id", "text", nMerges = nM, minPairCount = 2L,
      maxBatch = 256,
      progress = (rounds, rules) => {
        if (rules / 500 > lastMile) {
          lastMile = rules / 500
          println(f"[scale] zipf bpe: $rules%6d merges in $rounds%4d " +
            f"rounds (${rules.toDouble / rounds}%.1f merges/round) at " +
            f"${(System.nanoTime() - t0) / 1e9}%8.1f s")
        }
      })
    val zgot = zm.rules.count()
    println(f"[scale] zipf bpe FINAL: $zgot merges in $zrounds rounds " +
      f"(${zgot.toDouble / math.max(zrounds, 1)}%.1f merges/round), " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s total")
    zdocs.unpersist()
    }

    if (sections("crawl")) {
    // crawl-ingestion family xK: page construction + every extraction
    // tier. All scan-stage projections — the probe certifies LINEAR
    // and measures docs/sec; count() would prune the parse away, so
    // force full materialization through the noop sink.
    import graft.operators.{Html, Warc}
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val cdocs = replicate(Tables.documents(spark, d), k,
      Map("doc_id" -> 1000000L)).cache()
    val nDocs = cdocs.count()
    println(s"[scale] crawl documents rows: $nDocs")
    val pages = cdocs.select(col("doc_id"), concat(
      lit("<html><head><title>t "), col("doc_id").cast("string"),
      lit("</title><script>if (1 < 2) { var x = \"<p>\"; }</script></head><body>"),
      lit("<nav><a href=\"/\">home</a> <a href=\"/a\">about</a></nav><p>"),
      col("text"),
      lit("</p><li><a href=\"/b\">buy</a> <a href=\"/c\">now</a></li><p>"),
      col("text"), lit(" &lt;eof&gt;</p></body></html>")).as("html"))
    time("html_extract xK")(noop(
      Html.extract(pages, "doc_id", "html")))
    time("boilerplate xK (codegen expr)")(noop(
      Html.mainContent(pages, "doc_id", "html")))
    time("boilerplate xK (lambda reference)")(noop(
      pages.select(col("doc_id"),
        Html.mainContentColReference(col("html")).as("mc"))
        .select(col("doc_id"), col("mc.*"))))
    val segs = pages
      .groupBy(pmod(col("doc_id"), lit(64 * k)).as("seg"))
      .agg(concat_ws("", collect_list(concat(
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://example.com/doc/"),
        col("doc_id").cast("string"),
        lit("\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
        (octet_length(col("html")) + 44).cast("string"),
        lit("\r\n\r\nHTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
        col("html"), lit("\r\n\r\n")))).cast("binary").as("segment"))
      .cache()
    println(s"[scale] warc segments: ${segs.count()}")
    time("warc walk + html chain xK")(noop(
      Warc.records(segs, "seg", "segment")
        .filter(col("warc_type") === "response")
        .select(col("target_uri"), col("status"),
          length(Html.bodyTextCol(col("body"))).as("n_chars"))))
    segs.unpersist(); cdocs.unpersist()
    }

    if (sections("sketch")) {
    // sketch family xK: the approximate statistics vs the exact jobs
    // they replace, on the same replicated corpus. Outputs here are
    // group-sized (tiny), so count() does NOT prune the aggregation
    // work being measured.
    import graft.operators.{Sketch, TextAnalysis}
    import graft.functions.Fns
    val sdocs = replicate(Tables.documents(spark, d), k,
      Map("doc_id" -> 1000000L)).cache()
    println(s"[scale] sketch documents rows: ${sdocs.count()}")
    val stream = sdocs.select(col("source"),
      explode(Fns.shingles(col("text"), 3)).as("shingle"))
    // the exact job the sketch replaces: per-source distinct shingles
    time("distinct exact xK")(
      stream.groupBy("source")
        .agg(countDistinct("shingle").as("n")).count())
    // one-pass mergeable sketch + estimate (the 100 TB path)
    time("distinct hll one-pass xK")(
      Sketch.mergeEstimate(
        Sketch.hllSketchTable(stream, "shingle", Seq("source")),
        Seq("source")).count())
    // KMV overlap, sketch-only (audit=false: no corpus pair join) —
    // all 190 source pairs from one pass + k-row sketches
    time("kmv overlap sketch-only xK")(
      Sketch.kmvOverlap(stream, "shingle", "source", k = 64,
        audit = false).count())
    // exact pairwise overlap — the quadratic job KMV replaces
    time("pairwise overlap exact xK")(
      Sketch.kmvOverlap(stream, "shingle", "source", k = 64,
        audit = true).count())
    // takedown membership: 10% md5-coin drop list over xK docs
    val keyed = sdocs.select(col("doc_id"),
      col("doc_id").cast("string").as("k"))
    val isDrop = Fns.md5Hash31(concat(lit("takedown:"), col("k"))) % 10 === 0
    val drops = keyed.filter(isDrop).select(col("k")).cache()
    println(s"[scale] takedown list rows: ${drops.count()}")
    // the exact join everyone pays today
    time("takedown anti-join xK")(
      keyed.join(drops.withColumnRenamed("k", "dk"),
        col("k") === col("dk"), "left_anti").count())
    // bloom pre-filter sized 10 bits/key, then exact verify of the
    // bloom-positive sliver only — the scan-stage + pruned-join shape
    val mBits = 1 << 20
    val bitset = Sketch.bloomBitsetLit(drops, "k", mBits, 3)
    time("takedown bloom-bitset probe xK")(
      keyed.select(col("doc_id"),
        Sketch.bloomProbe(bitset, col("k"), mBits, 3).as("hit"))
        .filter(col("hit")).count())
    time("takedown bloom+verify xK")(
      keyed.filter(Sketch.bloomProbe(bitset, col("k"), mBits, 3))
        .join(drops.withColumnRenamed("k", "dk"),
          col("k") === col("dk"), "left_semi").count())
    // the KN bigram fit + application at xK (model table is
    // vocab²-bounded; corpus passes are the cost)
    time("kn bigram lm xK")(
      TextAnalysis.knBigramScore(sdocs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save())
    drops.unpersist(); sdocs.unpersist()

    // ---- high-cardinality twins --------------------------------------
    // The replicated corpus has a degenerate ~31-word vocabulary, so
    // distinct sets are tiny and every membership list broadcasts —
    // the regime where exact is cheap. These synthetic twins measure
    // the regime sketches exist for: millions of distinct keys and a
    // drop list too big to broadcast.
    val bigKeys = spark.range(5000000L).select(
      (col("id") % 20).cast("string").as("source"),
      concat(lit("key:"), col("id")).as("shingle"))
    time("distinct exact 5M-card")(
      bigKeys.groupBy("source")
        .agg(countDistinct("shingle").as("n")).count())
    time("distinct hll one-pass 5M-card")(
      Sketch.mergeEstimate(
        Sketch.hllSketchTable(bigKeys, "shingle", Seq("source")),
        Seq("source")).count())
    // KMV at high cardinality with REAL cross-slice overlap: 5M keys,
    // each shared by exactly two of 20 slices → the exact pairwise
    // join has 2.5M matches to shuffle; the sketch path bottom-ks one
    // pass and joins 64-row sketches
    val ovKeys = spark.range(5000000L).select(
      (col("id") % 20).cast("string").as("source"),
      concat(lit("key:"), (col("id") % 2500000L)).as("shingle"))
    time("kmv sketch-only 5M-card")(
      Sketch.kmvOverlap(ovKeys, "shingle", "source", k = 64,
        audit = false).count())
    time("pairwise overlap exact 5M-card")(
      Sketch.kmvOverlap(ovKeys, "shingle", "source", k = 64,
        audit = true).count())
    // membership at 10M probes vs a 1M-row list (past any broadcast
    // threshold: the exact anti-join must shuffle BOTH sides; the
    // bloom probe stays a scan-stage projection, and bloom+verify
    // shuffles only the ~true-positive sliver). fast=true is the
    // production xxhash64 family — the md5 oracle family costs 3
    // digests/row and is measured alongside for honesty.
    val bigCorpus = spark.range(10000000L)
      .select(col("id"), col("id").cast("string").as("k"))
    val bigDrops = spark.range(1000000L)
      .select((col("id") * 10).cast("string").as("k")).cache()
    println(s"[scale] big drop list rows: ${bigDrops.count()}")
    time("membership anti-join 10Mx1M")(
      bigCorpus.join(bigDrops.withColumnRenamed("k", "dk"),
        col("k") === col("dk"), "left_anti").count())
    val mBits2 = 1 << 24 // 16M bits / 2 MB for 1M keys: ~1% FP at kH=3
    val bitsetXx = Sketch.bloomBitsetLit(bigDrops, "k", mBits2, 3,
      fast = true)
    time("membership bloom probe 10Mx1M (xxh)")(
      bigCorpus.filter(
        Sketch.bloomProbe(bitsetXx, col("k"), mBits2, 3, fast = true))
        .count())
    time("membership bloom+verify 10Mx1M (xxh)")(
      bigCorpus.filter(
        Sketch.bloomProbe(bitsetXx, col("k"), mBits2, 3, fast = true))
        .join(bigDrops.withColumnRenamed("k", "dk"),
          col("k") === col("dk"), "left_semi").count())
    val bitsetMd5 = Sketch.bloomBitsetLit(bigDrops, "k", mBits2, 3)
    time("membership bloom probe 10Mx1M (md5)")(
      bigCorpus.filter(Sketch.bloomProbe(bitsetMd5, col("k"), mBits2, 3))
        .count())
    bigDrops.unpersist()

    // Count-Min at high cardinality: watchlist frequencies over 10M
    // rows / 500k distinct keys. The exact job groupBys the CORPUS by
    // key (a 500k-group shuffle that scales with key cardinality)
    // then joins the watchlist; the CM path pays one additive groupBy
    // into 3×65536 CELLS — constant-size regardless of cardinality,
    // map-side combined — and answers every probe from broadcast
    // cells. At 100 TB the exact path's shuffle grows with the data;
    // the sketch's stays 200k rows forever.
    val freqCorpus = spark.range(10000000L).select(
      concat(lit("key:"), (col("id") % 500000L)).as("k"))
    val watch = spark.range(10000L)
      .select(concat(lit("key:"), col("id") * 50).as("probe_key")).cache()
    println(s"[scale] watchlist rows: ${watch.count()}")
    time("freq exact groupBy+join 10Mx10k")(
      freqCorpus.groupBy(col("k").as("probe_key"))
        .agg(count(lit(1)).as("cnt"))
        .join(watch, Seq("probe_key"), "left_semi").count())
    val cmW = 65536
    val cm = time("cm sketch build 10M (md5, 3x64k cells)")(
      Sketch.cmSketchRows(freqCorpus, "k", depth = 3, width = cmW)
        .localCheckpoint())
    time("cm watchlist probe 10k (md5)")(
      Sketch.cmPointEstimate(cm, watch, "probe_key", 3, cmW).count())
    val cmXx = time("cm sketch build 10M (xxh)")(
      Sketch.cmSketchRows(freqCorpus, "k", depth = 3, width = cmW,
        fast = true).localCheckpoint())
    time("cm watchlist probe 10k (xxh)")(
      Sketch.cmPointEstimate(cmXx, watch, "probe_key", 3, cmW,
        fast = true).count())
    // join-size estimate: 5M×5M sides with 50M matches — the exact
    // pre-flight number costs the very join it is meant to gate; the
    // CM estimate is two one-pass sketches + a cells-sized join
    val sideA = spark.range(5000000L).select(
      concat(lit("key:"), (col("id") % 250000L)).as("k"))
    val sideB = spark.range(5000000L).select(
      concat(lit("key:"), (col("id") % 500000L)).as("k"))
    time("join-size exact 5Mx5M")(
      sideA.join(sideB, Seq("k")).count())
    time("join-size cm estimate 5Mx5M (xxh)")(
      Sketch.cmJoinSizeEstimate(
        Sketch.cmSketchRows(sideA, "k", depth = 3, width = cmW,
          fast = true),
        Sketch.cmSketchRows(sideB, "k", depth = 3, width = cmW,
          fast = true)).count())
    watch.unpersist()
    }

    if (sections("cmstore")) {
    // CM store lifecycle at 10M rows / 500k keys: build, fold one 1%
    // shard, retract it exactly, serve a watchlist — the persisted
    // frequency artifact's full maintenance loop. Costs are
    // cells-sized (3×64k rows) after the one corpus pass each way.
    import graft.operators.Sketch
    val cmRoot = java.nio.file.Files
      .createTempDirectory("cmstore_probe").toString + "/sk"
    val keyed = spark.range(10000000L).select(
      concat(lit("key:"), (col("id") % 500000L)).as("k"),
      (col("id") % 100).as("shard"))
    time("cm store build 10M (xxh)")(
      Sketch.buildCmStore(keyed.filter(col("shard") =!= 0).select("k"),
        "k", cmRoot, depth = 3, width = 65536, fast = true))
    val s0 = keyed.filter(col("shard") === 0).select("k")
    time("cm store upsert 1% shard")(
      Sketch.upsertCm(s0, "k", cmRoot, "s0"))
    time("cm store retract 1% shard")(
      Sketch.retractCm(s0, "k", cmRoot, "s0"))
    val cmWatch = spark.range(10000L)
      .select(concat(lit("key:"), col("id") * 50).as("probe_key"))
    time("cm store watchlist read 10k")(
      Sketch.readCmEstimates(spark, cmRoot, cmWatch, "probe_key").count())
    }

    if (sections("graph")) {
    // PageRank linearity: 5 fixed-point iterations, each one
    // edge⋈rank equi-join + one groupBy(dst) — cost should scale
    // with edges, iteration count fixed. Graph shape mirrors
    // q_pagerank (30% of links on one hub).
    import graft.operators.LinkGraph
    def prEdges(nE: Long) = {
      val hosts = nE / 10
      spark.range(nE).select(
        (col("id") % hosts).as("src"),
        when(col("id") % 10 < 3, lit(0L))
          .otherwise((col("id") * 31 + 7) % hosts).as("dst"))
    }
    time("pagerank 200k edges / 20k hosts (5 iter)")(
      LinkGraph.pageRankMicro(prEdges(200000L), 5).count())
    time("pagerank 2M edges / 200k hosts (5 iter)")(
      LinkGraph.pageRankMicro(prEdges(2000000L), 5).count())
    time("pagerank 20M edges / 2M hosts (5 iter)")(
      LinkGraph.pageRankMicro(prEdges(20000000L), 5).count())
    // the x100 point (200M edges / 20M hosts) — run explicitly via
    // the section filter ("graph100"): it is a multi-minute solo job
    // that would distort every other section's numbers if bundled
    if (sections("graph100"))
      time("pagerank 200M edges / 20M hosts (5 iter)")(
        LinkGraph.pageRankMicro(prEdges(200000000L), 5).count())
    }
    if (sections("graph100") && !sections("graph")) {
    import graft.operators.LinkGraph
    def prEdges100(nE: Long) = {
      val hosts = nE / 10
      spark.range(nE).select(
        (col("id") % hosts).as("src"),
        when(col("id") % 10 < 3, lit(0L))
          .otherwise((col("id") * 31 + 7) % hosts).as("dst"))
    }
    time("pagerank 200M edges / 20M hosts (5 iter)")(
      LinkGraph.pageRankMicro(prEdges100(200000000L), 5).count())
    }

    // round-12 families: kmeans fit growth (corpus × iters), doremi
    // excess-fit growth (two scans; the MW loop is domains-sized),
    // ft-multiclass frozen scoring growth (train is seed-bounded)
    if (sections("round12")) {
    import graft.operators.{Doremi, FtClassify, Kmeans}
    val emb1 = Tables.embeddings(spark, d).cache()
    println(s"[scale] kmeans emb rows x1: ${emb1.count()}")
    val m1 = time("kmeans fit x1 (k=8, 3 iters)")(
      Kmeans.fit(emb1, "vec_id", "embedding", 8, 64, 3))
    time("kmeans assign x1")(
      Kmeans.assign(emb1, "vec_id", "embedding", m1).count())
    val embK = replicate(Tables.embeddings(spark, d), k,
      Map("vec_id" -> 10000000L)).cache()
    println(s"[scale] kmeans emb rows xK: ${embK.count()}")
    val mK = time(s"kmeans fit x$k (k=8, 3 iters)")(
      Kmeans.fit(embK, "vec_id", "embedding", 8, 64, 3))
    time(s"kmeans assign x$k")(
      Kmeans.assign(embK, "vec_id", "embedding", mK).count())
    embK.unpersist(); emb1.unpersist()

    val docs1 = Tables.documents(spark, d).cache(); docs1.count()
    time("doremi weights x1")(
      Doremi.domainWeights(docs1, "doc_id", "text", "source").count())
    val docsK = replicate(Tables.documents(spark, d), k,
      Map("doc_id" -> 10000000L)).cache()
    println(s"[scale] doremi docs rows xK: ${docsK.count()}")
    time(s"doremi weights x$k")(
      Doremi.domainWeights(docsK, "doc_id", "text", "source").count())

    val seed = docs1.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"), col("lang"))
    val mc = time("ft mc train (seed, 40 epochs)")(
      FtClassify.trainMc(seed, "doc_id", "text", "lang"))
    time("ft mc frozen score x1")(
      FtClassify.scoreFrozenMc(docs1, "doc_id", "text", mc).count())
    time(s"ft mc frozen score x$k")(
      FtClassify.scoreFrozenMc(docsK, "doc_id", "text", mc).count())
    docsK.unpersist(); docs1.unpersist()
    }

    // SemDeDup's inherent skew surface: the within-cell pair scan is
    // quadratic in CELL size (not corpus size) — measure the cell²
    // law on a synthetic hot cell and report whether the cluster
    // equi-join skew-splits under AQE
    if (sections("hotcell")) {
    import graft.operators.Kmeans
    import org.apache.spark.sql.DataFrame
    def corpus(nHot: Int, nCold: Int): DataFrame = {
      import spark.implicits._
      val rows = (0 until nHot).map { i =>
        // tight cluster around e_0: every pair's cosine ~1
        val v = Array.tabulate(64)(j =>
          if (j == 0) 1f else (((i * 31 + j) % 97) - 48) * 1e-4f)
        (i.toLong, v)
      } ++ (0 until nCold).map { i =>
        val v = Array.tabulate(64)(j => math.sin(i * 0.7 + j).toFloat)
        ((nHot + i).toLong, v)
      }
      spark.createDataset(rows.toSeq).toDF("vec_id", "embedding")
    }
    Seq(("defaults", "10485760"), ("no-broadcast", "-1"))
      .foreach { case (regime, thresh) =>
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      Seq((2000, 2000), (6000, 6000)).foreach { case (h, c) =>
        val emb = corpus(h, c).cache(); emb.count()
        val pairs = Kmeans.semdedupPairs(emb, "vec_id", "embedding",
          k = 8, dim = 64, iters = 2, threshold = 0.999)
        val n = time(s"kmeans semdedup [$regime] hot=$h cold=$c")(
          pairs.count())
        val plan = pairs.queryExecution.executedPlan.toString
        val join =
          if (plan.contains("BroadcastHashJoin")) "BHJ"
          else if (plan.contains("SortMergeJoin")) "SMJ"
          else if (plan.contains("ShuffledHashJoin")) "SHJ"
          else "?"
        println(s"[scale] hotcell [$regime] pairs=$n join=$join " +
          s"skewHandled=${plan.contains("skewed=true") || plan.contains("Skew")}")
        emb.unpersist()
      }
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }

    // Round-13 near-dup families: (a) the two-family MinHash hash
    // cost — the md5 ORACLE family's signature projection vs the
    // xxhash64 production family's whole candidate pipeline (the
    // declared "production = xxhash64" claim, with numbers); (b) the
    // gram-projection vector cost (linear — one codegen pass) vs the
    // quadratic pair scan (the declared oracle-twin law; the scale
    // path is LSH/ANN over the vectors).
    if (sections("neardup")) {
    val nd1 = Tables.documents(spark, d).cache(); nd1.count()
    val ndK = replicate(Tables.documents(spark, d), k,
      Map("doc_id" -> 1000000L)).cache()
    println(s"[scale] neardup docs xK: ${ndK.count()}")
    Seq(("x1", nd1), (s"x$k", ndK)).foreach { case (tag, dd) =>
      time(s"neardup[$tag] md5 minhash signatures")(
        Dedup.minhashMd5Signatures(dd, "doc_id", "text", 3, 16).count())
      time(s"neardup[$tag] xxhash64 minhash candidates")(
        Dedup.minhashLsh(dd, "doc_id", "text", 3, 16, 4).count())
      time(s"neardup[$tag] md5 minhash verified pairs")(
        Dedup.minhashMd5Pairs(dd, "doc_id", "text", 3, 16, 4, 0.8)
          .count())
      time(s"neardup[$tag] gram vectors")(
        Dedup.gramProjectVectors(dd, "doc_id", "text", 3, 16).count())
    }
    time("neardup[x1] gram pairs (quadratic twin)")(
      Dedup.gramProjectPairs(nd1, "doc_id", "text", 3, 16, 0.9).count())
    nd1.unpersist(); ndK.unpersist()
    }

    // Large-k assignment wall (r12 verdict #2): exact NearestCentroid
    // is O(k·dim) per row — measure the wall at k 256→4096 on a xK
    // corpus, then the two-level tier (nCoarse=64, nProbe 4/8) on the
    // same model, with the agreement fraction vs exact. The model is
    // init-only (bottom-k md5 seeds): assignment cost depends only on
    // k·dim, not on how converged the centroids are.
    if (sections("bigk")) {
    import graft.operators.Kmeans
    val emb = replicate(Tables.embeddings(spark, d), k,
      Map("vec_id" -> 10000000L)).cache()
    println(s"[scale] bigk emb rows: ${emb.count()}  (k=$k replicas)")
    Seq(256, 1024, 4096).foreach { bigK =>
      val model = Kmeans.init(emb, "vec_id", "embedding", bigK, 64)
      time(s"assign exact k=$bigK")(
        Kmeans.assign(emb, "vec_id", "embedding", model).count())
      if (bigK == 4096) {
        Seq(4, 8).foreach { nProbe =>
          time(s"assign tiered k=$bigK nCoarse=64 nProbe=$nProbe")(
            Kmeans.assignTiered(emb, "vec_id", "embedding", model,
              nCoarse = 64, nProbe = nProbe).count())
        }
        val ex = Kmeans.assign(emb, "vec_id", "embedding", model)
          .select(col("id"), col("cluster").as("c_exact"))
        val ti = Kmeans.assignTiered(emb, "vec_id", "embedding", model,
            nCoarse = 64, nProbe = 8)
          .select(col("id"), col("cluster").as("c_tier"))
        val n = ex.count()
        val same = ex.join(ti, "id")
          .filter(col("c_exact") === col("c_tier")).count()
        println(s"[scale] bigk agreement nProbe=8: $same/$n " +
          f"(${same.toDouble / n}%.4f)")
      }
    }
    emb.unpersist()
    }

    // Perceptual-hash families (round 14): decode cost is the scan
    // (one codegen walk per payload, only 8-24 signature bytes
    // leave), pairs are band-key equi-joins. Measure decode
    // throughput and the pair scans on xK replicated payload corpora
    // — the decode should scale linearly with payload bytes and the
    // pair walls with band collisions, never with n².
    if (sections("phash")) {
    import graft.functions.{SyntheticImage, SyntheticVideo, SyntheticWav}
    import graft.operators.MultiModal
    val docs = replicate(Tables.documents(spark, d), k,
      Map("doc_id" -> 10000000L))
    val img = docs.select(col("doc_id"), SyntheticImage
        .syntheticImage(col("doc_id").cast("long"), col("text"))
        .as("payload")).cache()
    println(s"[scale] phash payload rows: ${img.count()}  (k=$k replicas)")
    time("image decode+ahash xK")(
      MultiModal.imagePHashSignatures(img, "doc_id", "payload").count())
    time("image neardup pairs xK (h=2)")(
      MultiModal.imageNearDupPairs(img, "doc_id", "payload", 2).count())
    img.unpersist()
    val aud = docs.select(col("doc_id"), SyntheticWav
        .syntheticWav(col("doc_id").cast("long"), col("text"))
        .as("payload")).cache()
    aud.count()
    time("audio decode+ehash xK")(
      MultiModal.audioPHashSignatures(aud, "doc_id", "payload").count())
    time("audio neardup pairs xK (h=2)")(
      MultiModal.audioNearDupPairs(aud, "doc_id", "payload", 2).count())
    aud.unpersist()
    val vid = docs.select(col("doc_id"), SyntheticVideo
        .syntheticVideo(col("doc_id").cast("long"), col("text"))
        .as("payload")).cache()
    vid.count()
    time("video frame walk xK")(
      MultiModal.videoFrameHashes(vid, "doc_id", "payload").count())
    time("video neardup pairs xK (shared>=2)")(
      MultiModal.videoNearDupPairs(vid, "doc_id", "payload", 2L).count())
    vid.unpersist()
    }

    // Band-key collision curve, narrow vs wide (r14 verdict #2): the
    // 8-24-bit narrow keys flood as the corpus grows — measure the
    // generated candidate pairs (Σ per-band Σ per-key C(n,2), the
    // equi-join's actual work) for both schemes on the SAME decoded
    // signatures, plus the end-to-end pair-scan walls.
    if (sections("wideband")) {
    import graft.functions.SyntheticImage
    import graft.operators.MultiModal
    val docs = replicate(Tables.documents(spark, d), k,
      Map("doc_id" -> 10000000L))
    val img = docs.select(col("doc_id"), SyntheticImage
        .syntheticImage(col("doc_id").cast("long"), col("text"))
        .as("payload"))
    val sig = MultiModal.imagePHashSignatures(img, "doc_id", "payload")
      .select("doc_id", "ahash", "dhash").cache()
    println(s"[scale] wideband images: ${sig.count()}  (k=$k replicas)")
    def candPairs(label: String, bandKeys: Seq[org.apache.spark.sql.Column])
    : Unit = {
      val total = bandKeys.map { kc =>
        sig.groupBy(kc.as("key")).agg(count(lit(1)).as("c"))
          .agg(sum(expr("c * (c - 1) DIV 2")).cast("long"))
          .head.getLong(0)
      }.sum
      println(s"[scale] wideband candidates $label: $total")
    }
    // narrow (h=2): 3 row groups of the 8 aHash bytes → 24/24/16 bits
    candPairs("narrow-24bit", Seq(
      col("ahash").bitwiseAND(0xFFFFFFL),
      shiftrightunsigned(col("ahash"), 24).bitwiseAND(0xFFFFFFL),
      shiftrightunsigned(col("ahash"), 48).bitwiseAND(0xFFFFL)))
    // wide (h=2): 3 groups of the 16 aHash‖dHash bytes → 48/40/40 bits
    candPairs("wide-48bit", Seq(
      col("ahash").bitwiseAND(0xFFFFFFFFFFFFL),
      shiftrightunsigned(col("ahash"), 48).bitwiseAND(0xFFFFL) +
        col("dhash").bitwiseAND(0xFFFFFFL) * lit(65536L),
      shiftrightunsigned(col("dhash"), 24).bitwiseAND(0xFFFFFFFFFFL)))
    time("image neardup pairs xK narrow (h=2)")(
      MultiModal.imageNearDupPairs(img, "doc_id", "payload", 2).count())
    time("image neardup pairs xK wide (h=2)")(
      MultiModal.imageNearDupPairsWide(img, "doc_id", "payload", 2).count())
    sig.unpersist()
    }

    // md5DenseRank at scale (r13 verdict #3): the generic re-key's
    // single-task window depth is n/buckets — confirm the derived
    // bucket count holds it at ~4M, the md5 bucketing is skewless
    // (max/mean per-bucket count ~ 1), and the rank output is the
    // [0, n) bijection, on an id set orders of magnitude past the
    // gate corpus.
    if (sections("md5rank")) {
    import graft.operators.FeatureEng
    val n = 2000000L * k // k=10 → 20M string ids
    val ids = spark.range(n)
      .select(concat(lit("doc:"), col("id")).as("id"))
      .localCheckpoint(false)
    val head = time(s"md5DenseRank auto-buckets n=$n")(
      FeatureEng.md5DenseRank(ids, "id")
        .agg(min("rid"), max("rid"), count(lit(1))).head())
    println(s"[scale] md5rank bijection: min=${head.getLong(0)} " +
      s"max=${head.getLong(1)} count=${head.getLong(2)} (want 0, " +
      s"${n - 1}, $n)")
    // skew check at the derived width: uniform by construction, but
    // measured — a max/mean ratio far from 1 would mean the 31-bit
    // md5 cut is NOT uniform and the window depth has a hot tail
    val nB = FeatureEng.derivedRankBuckets(n) // the ONE derivation
    val width = (1L << 31) / nB + 1
    val per = ids
      .withColumn("h", graft.functions.Fns.md5Hash31(col("id")))
      .withColumn("bkt", expr(s"h DIV $width"))
      .groupBy("bkt").count().agg(
        max("count").as("mx"), avg("count").as("mean"),
        count(lit(1)).as("nb")).head()
    println(f"[scale] md5rank skew: buckets=${per.getLong(2)} " +
      f"max=${per.getLong(0)} mean=${per.getDouble(1)}%.0f " +
      f"ratio=${per.getLong(0) / per.getDouble(1)}%.4f")
    // the depth/width trade: more buckets = shallower windows, same
    // answer (rid is buckets-independent — property-spec-held)
    time(s"md5DenseRank buckets=1024 n=$n")(
      FeatureEng.md5DenseRank(ids, "id", buckets = 1024).count())
    }

    // Tier QUALITY (r13 verdict #2): semdedupPairsTiered ships a
    // speed dial (nProbe) whose pair-level recall was asserted to
    // "move" but never measured. Grid over (bigK, nProbe) at fixed
    // nCoarse=64 on the xK corpus: pair recall vs the exact-blocking
    // pair set (identical fit — the integer Lloyd is deterministic,
    // so the re-fit inside each call reproduces the same model),
    // EXTRA pairs the tier gains (pairs the exact blocking split
    // across cells — still true >= threshold pairs, so they are
    // bonus recall vs the all-pairs gold, not errors), and the
    // row-level assignment agreement alongside.
    if (sections("tierrecall")) {
    import graft.operators.Kmeans
    val emb = replicate(Tables.embeddings(spark, d), k,
      Map("vec_id" -> 10000000L)).cache()
    println(s"[scale] tierrecall emb rows: ${emb.count()}  (k=$k replicas)")
    val thr = 0.4
    Seq(1024, 4096).foreach { bigK =>
      val exact = time(s"semdedup exact pairs k=$bigK")(
        Kmeans.semdedupPairs(emb, "vec_id", "embedding", bigK, 64,
            iters = 1, threshold = thr)
          .select("doc_a", "doc_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet)
      println(s"[scale] tierrecall k=$bigK exact pairs: ${exact.size}")
      val model = Kmeans.fit(emb, "vec_id", "embedding", bigK, 64, 1)
      val ex = Kmeans.assign(emb, "vec_id", "embedding", model)
        .select(col("id"), col("cluster").as("c_exact"))
        .cache() // loop-invariant: one materialization for 3 nProbe dials
      val n = ex.count()
      Seq(4, 8, 16).foreach { nProbe =>
        val tiered = time(s"semdedup tiered k=$bigK nProbe=$nProbe")(
          Kmeans.semdedupPairsTiered(emb, "vec_id", "embedding", bigK,
              64, iters = 1, threshold = thr, nCoarse = 64, nProbe)
            .select("doc_a", "doc_b").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet)
        val hit = (tiered intersect exact).size
        val ti = Kmeans.assignTiered(emb, "vec_id", "embedding", model,
            nCoarse = 64, nProbe = nProbe)
          .select(col("id"), col("cluster").as("c_tier"))
        val same = ex.join(ti, "id")
          .filter(col("c_exact") === col("c_tier")).count()
        println(f"[scale] tierrecall k=$bigK nCoarse=64 nProbe=$nProbe: " +
          f"pair recall $hit/${exact.size} " +
          f"(${if (exact.isEmpty) 1.0 else hit.toDouble / exact.size}%.4f) " +
          f"extra ${(tiered diff exact).size} " +
          f"assign agree ${same.toDouble / n}%.4f")
      }
      // full probe: bit-equal blocking → identical pair set (sanity)
      val full = Kmeans.semdedupPairsTiered(emb, "vec_id", "embedding",
          bigK, 64, iters = 1, threshold = thr, nCoarse = 64,
          nProbe = 64)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[scale] tierrecall k=$bigK full-probe identical: " +
        s"${full == exact}")
      ex.unpersist()
    }
    emb.unpersist()
    }

    if (sections("emb")) {
    // embeddings xK: unique vec ids, duplicated vectors — the blocked
    // equi-join's O(n²) work grows k², so this curve is the honest cost
    // of the exact moderate-threshold path
    val emb = replicate(Tables.embeddings(spark, d), k,
      Map("vec_id" -> 1000000L)).cache()
    println(s"[scale] embeddings rows: ${emb.count()}")
    time("embedding blocked-exact xK")(
      Dedup.embeddingCosine(emb, "vec_id", "embedding", 0.4, nBlocks = 32)
        .count())
    time("embedding LSH+verify xK (thr 0.9)")(
      Dedup.embeddingCosineLsh(emb, "vec_id", "embedding", 0.9, dim = 64)
        .count())
    // exact-first, then LSH on the canonicals: the text pipeline's
    // stage order applied to vectors — the dup-bomb's k-fold replicas
    // collapse in one shuffle, removing the k² bucket blowup the
    // plain LSH row above pays
    time("embedding exact+LSH canon xK")({
      val canon = Dedup.embeddingExact(emb, "vec_id", "embedding")
        .select(col("canonical_id").as("vec_id"), col("embedding"))
      Dedup.embeddingCosineLsh(canon, "vec_id", "embedding", 0.9,
        dim = 64).count()
    })
    // SemDeDup at the same moderate threshold the exact path pays
    // n² for: cell-blocked work is ~n²/nCells plus one k-means — the
    // honest scale answer where LSH cannot prune (probe includes the
    // training, which the quantizer cache amortizes in steady state)
    time("embedding semdedup xK (64 cells)")(
      Dedup.embeddingSemdedup(emb, "vec_id", "embedding", 0.4, 64)
        .count())
    // the packaged keep list: exact collapse -> semdedup on the
    // canonicals -> keep-min; near-k-independent (only the linear
    // exact stage sees all n rows)
    time("embedding keepList xK (64 cells)")(
      Dedup.embeddingKeepList(emb, "vec_id", "embedding", 0.4, 64)
        .count())
    // persisted-index serving at xK: build once (timed separately),
    // then the serve path 100 queries probe 4/64 cells — the number
    // that matters is the SERVE, which file-prunes to probed cells
    val ivfRoot = java.nio.file.Files
      .createTempDirectory("probe_ivf").toString + "/idx"
    time("ivf index build xK (64 cells)")(
      Ann.ivfBuildIndex(emb, "vec_id", "embedding", 64, ivfRoot))
    val queries = emb.filter(col("vec_id") < 100).cache()
    queries.count()
    time("ivf serve 100q nProbe=4")(
      Ann.ivfServe(spark, ivfRoot, queries, "vec_id", "embedding",
        nProbe = 4, k = 10).count())
    time("ivf serve 100q nProbe=4 (2nd)")(
      Ann.ivfServe(spark, ivfRoot, queries, "vec_id", "embedding",
        nProbe = 4, k = 10).count())
    // incremental semdedup: a 50-vector batch dedup'd against the xK
    // index used as state — cost must be batch-shaped (cell-pruned
    // state read + broadcast centroid assign), not index-shaped
    val incBatch = Tables.embeddings(spark, d).limit(50)
      .select((col("vec_id") + lit(100000000L)).as("vec_id"),
        col("embedding"))
    time("semdedup incremental 50 vecs")(
      Dedup.embeddingSemdedupIncremental(incBatch, "vec_id", "embedding",
        ivfRoot, 0.4).count())
    // semantic decontam: the xK corpus against a broadcast eval slice
    // — cost is |corpus|·|eval| dot products, corpus never shuffles
    time("semantic decontam xK vs eval slice")(
      Ann.semanticDecontam(emb.filter(col("vec_id") % 10 =!= 0),
        Tables.embeddings(spark, d).filter(col("vec_id") % 10 === 0),
        "vec_id", "embedding", 0.3).count())
    // PQ tier (32×): codebook train is sample-bounded driver work;
    // encode+scan touches m bytes/vector instead of dim floats — the
    // number that matters is the compressed scan's growth vs brute
    val pqp = time("pq train (m=8 k=16, 64k sample)")(
      Ann.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16))
    time("pq brute scan 100q xK")(
      Ann.bruteTopKPq(emb, queries, "vec_id", "embedding", k = 10,
        pqp).count())
    val pqRoot = java.nio.file.Files
      .createTempDirectory("probe_ivfpq").toString + "/idx"
    time("ivf-pq index build xK (64 cells)")(
      Ann.ivfBuildIndexPq(emb, "vec_id", "embedding", 64, dim = 64,
        m = 8, k = 16, indexRoot = pqRoot))
    time("ivf-pq serve 100q nProbe=4")(
      Ann.ivfServePq(spark, pqRoot, queries, "vec_id", "embedding",
        nProbe = 4, k = 10).count())
    queries.unpersist()
    emb.unpersist()
    }
    spark.stop()
  }
}
