package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.offline.VersionedStore
import graft.operators.Search

class SearchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString + "/idx"

  private def rows(df: org.apache.spark.sql.DataFrame)
  : Set[(Long, Long, Long, Double)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  /** Corpus query batch used by the persisted-index tests: every 7th
    * doc's first 8 words. */
  private def corpusAndQueries() = {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val queries = docs.filter($"doc_id" % 7 === 0)
      .select($"doc_id".as("q_id"),
        array_join(slice(split($"text", " "), 1, 8), " ").as("q_text"))
    (docs, queries)
  }

  test("bm25TopK: full-overlap doc outranks partial overlap; disjoint docs never match") {
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana pear plum quince fig"),
      (3L, "wolf fox bear")
    ).toDF("doc_id", "text")
    val queries = Seq((10L, "apple banana cherry")).toDF("q_id", "q_text")
    val got = Search.bm25TopK(docs, "doc_id", "text",
      queries, "q_id", "q_text", k = 10).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap
    // doc 1 matches all three query terms (incl. the rarer "cherry")
    // and is shorter → rank 1; doc 2 matches two; doc 3 matches none
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("bm25TopK: rarer terms weigh more (idf ordering)") {
    // "common" is in every doc (minimal idf); "rare" in one
    val docs = Seq(
      (1L, "common rare alpha beta"),
      (2L, "common alpha beta gamma"),
      (3L, "common beta gamma delta"),
      (4L, "common gamma delta epsilon")
    ).toDF("doc_id", "text")
    val queries = Seq((1L, "common rare")).toDF("q_id", "q_text")
    val top = Search.bm25TopK(docs, "doc_id", "text",
      queries, "q_id", "q_text", k = 1).collect()
    assert(top.length == 1 && top(0).getLong(1) == 1L,
      "the only doc containing the rare term must rank first")
  }

  test("bm25TopK: null/empty texts and no-term queries are inert") {
    val docs = Seq((1L, "alpha beta"), (2L, null.asInstanceOf[String]),
      (3L, "")).toDF("doc_id", "text")
    val queries = Seq((1L, "alpha"), (2L, ""), (3L, "zzz"))
      .toDF("q_id", "q_text")
    val got = Search.bm25TopK(docs, "doc_id", "text",
      queries, "q_id", "q_text", k = 5).collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L),
      "empty queries and unmatched vocab return no rows; null/empty " +
        "docs never surface")
    assert(got.map(_.getLong(1)).toSet == Set(1L))
  }

  test("tfidfCosineTopK: an exact distinct-word match scores cosine 1.0 at rank 1") {
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana pear plum"),
      (3L, "wolf fox bear")
    ).toDF("doc_id", "text")
    // query == doc 1's text; all words distinct so tf == qtf == 1 and
    // the weight vectors are identical → cosine exactly 1.0
    val queries = Seq((10L, "apple banana cherry")).toDF("q_id", "q_text")
    val got = Search.tfidfCosineTopK(docs, "doc_id", "text",
      queries, "q_id", "q_text", k = 10).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.head == ((1L, 1L, 1.0)))
    assert(got.map(_._1).toSet == Set(1L, 2L), "doc 3 shares no term")
  }

  test("tfidfCosineTopK: unknown query terms depress the score via the query norm") {
    val docs = Seq((1L, "apple banana"), (2L, "apple cherry"))
      .toDF("doc_id", "text")
    val full = Search.tfidfCosineTopK(docs, "doc_id", "text",
      Seq((1L, "apple banana")).toDF("q_id", "q_text"),
      "q_id", "q_text", k = 1).collect().head.getDouble(3)
    val noisy = Search.tfidfCosineTopK(docs, "doc_id", "text",
      Seq((1L, "apple banana zzz")).toDF("q_id", "q_text"),
      "q_id", "q_text", k = 1).collect().head.getDouble(3)
    assert(full == 1.0 && noisy < full,
      s"an out-of-vocabulary term must cost norm mass: $noisy !< $full")
  }

  test("phraseSearch: contiguity, occurrence counts, duplicate terms, positions") {
    val docs = Seq(
      (1L, "x a b a b y"),    // "a b" twice (pos 1, 3); "a b a" once
      (2L, "a x b"),          // terms present but NOT contiguous
      (3L, "a b"),            // exact-doc match at pos 0
      (4L, "c c c")           // duplicate-term corpus
    ).toDF("doc_id", "text")
    val phrases = Seq((10L, "a b"), (20L, "a b a"), (30L, "c c"))
      .toDF("q_id", "phrase")
    val got = Search.phraseSearch(docs, "doc_id", "text",
      phrases, "q_id", "phrase").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got((10L, 1L)) == ((2L, 1L)), "two occurrences, first at 1")
    assert(got((10L, 3L)) == ((1L, 0L)))
    assert(!got.contains((10L, 2L)), "non-contiguous terms must not match")
    assert(got((20L, 1L)) == ((1L, 1L)), "duplicate-term phrase exact")
    assert(got((30L, 4L)) == ((2L, 0L)), "overlapping occurrences both count")
    assert(got.keySet.map(_._1) == Set(10L, 20L, 30L))
  }

  test("rrfFuse: agreement across rankers outranks a single high rank") {
    val r1 = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("q_id", "doc_id", "rank")
    val r2 = Seq((1L, 11L, 1L), (1L, 10L, 2L), (1L, 13L, 3L))
      .toDF("q_id", "doc_id", "rank")
    val got = Search.rrfFuse(Seq(r1, r2), k = 10).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // docs 10 and 11 each hold {rank1, rank2} → equal fused score,
    // tie to the lower doc_id; docs 12/13 appear once each
    assert(got.take(2).map(_._1).toSeq == Seq(10L, 11L))
    assert(got(0)._3 == got(1)._3)
    val one = BigDecimal(1.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val two = BigDecimal(1.0 / 62).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(got(0)._3 == (one + two).toDouble)
    assert(got.map(_._1).toSet == Set(10L, 11L, 12L, 13L))
    intercept[IllegalArgumentException] {
      Search.rrfFuse(Seq(r1.drop("rank")), k = 10)
    }
  }

  test("retrievalMetrics: first-relevant rank, reciprocal rank, and misses") {
    val results = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),  // relevant at rank 3
      (2L, 20L, 1L), (2L, 21L, 2L)                   // nothing relevant
    ).toDF("q_id", "doc_id", "rank")
    // q 3 has a relevance judgment but NO results at all — the
    // worst miss, and it must surface as a 0 row (qrels contract)
    val rel = Seq((1L, 12L), (1L, 99L), (2L, 77L), (3L, 30L))
      .toDF("q", "doc")
    val got = Search.retrievalMetrics(results, rel, "q", "doc", k = 10)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got(1L) == ((3L, 0.333333, 1L)))
    assert(got(2L) == ((0L, 0.0, 0L)), "missed queries still get a row")
    assert(got(3L) == ((0L, 0.0, 0L)),
      "a judged query with zero results must appear as a zero row")
    assert(got.size == 3)
  }

  test("persisted index: serve equals the batch scorer row-for-row") {
    val (docs, queries) = corpusAndQueries()
    val root = tmp("bm25idx")
    Search.buildTextIndex(spark, docs, "doc_id", "text", root)
    val batch = rows(Search.bm25TopK(docs, "doc_id", "text",
      queries, "q_id", "q_text", k = 5))
    val served = rows(Search.serveBm25(spark, root, queries,
      "q_id", "q_text", k = 5))
    assert(batch.nonEmpty && served == batch)
  }

  test("bm25TopKFromIndex: the collect-free bulk path equals batch on a corpus-as-queries batch") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val root = tmp("bm25bulk")
    Search.buildTextIndex(spark, docs, "doc_id", "text", root)
    // EVERY doc is a query — the batch serveBm25's driver collect is
    // not meant for, and the reason the bulk path exists
    val queries = docs.select($"doc_id".as("q_id"),
      array_join(slice(split($"text", " "), 1, 8), " ").as("q_text"))
    val batch = rows(Search.bm25TopK(docs, "doc_id", "text",
      queries, "q_id", "q_text", k = 3))
    val bulk = rows(Search.bm25TopKFromIndex(spark, root, queries,
      "q_id", "q_text", k = 3))
    assert(batch.nonEmpty && bulk == batch)
  }

  test("persisted index: serve opens only the probed terms' posting files") {
    val (docs, _) = corpusAndQueries()
    val root = tmp("bm25prune")
    Search.buildTextIndex(spark, docs, "doc_id", "text", root)
    val allFiles = VersionedStore.read(spark, s"$root/postings")
      .inputFiles.toSet
    assert(allFiles.size >= 8,
      s"term-sorted build should spread over several files, got " +
        s"${allFiles.size}")
    // a one-term query (a REAL corpus term, so at least one file must
    // open) touches one term's range
    val term = docs
      .select(element_at(split($"text", " "), 1).as("t"))
      .filter(length($"t") > 0)
      .first().getString(0)
    val queries = Seq((1L, term)).toDF("q_id", "q_text")
    val statsFiles = VersionedStore.read(spark, s"$root/stats")
      .inputFiles.toSet
    val opened = Search.serveBm25(spark, root, queries, "q_id", "q_text",
      k = 5).inputFiles.toSet -- statsFiles
    assert(opened.nonEmpty && opened.subsetOf(allFiles))
    assert(opened.size < allFiles.size,
      s"one-term serve must open a strict subset of the inverted " +
        s"file: opened ${opened.size} of ${allFiles.size}")
  }

  test("indexUpsert: append-shard refresh equals a full rebuild, and replays no-op") {
    val (docs, queries) = corpusAndQueries()
    val shard = docs.filter($"doc_id" % 10 === 3)
    val rest = docs.filter($"doc_id" % 10 =!= 3)
    val incRoot = tmp("bm25inc")
    val fullRoot = tmp("bm25full")
    Search.buildTextIndex(spark, rest, "doc_id", "text", incRoot)
    Search.indexUpsert(spark, shard, "doc_id", "text", incRoot)
    Search.buildTextIndex(spark, docs, "doc_id", "text", fullRoot)
    def stats(r: String) = VersionedStore.read(spark, s"$r/stats")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(stats(incRoot) == stats(fullRoot),
      "corpus stats must track the shard delta exactly")
    val inc = rows(Search.serveBm25(spark, incRoot, queries,
      "q_id", "q_text", k = 5))
    val full = rows(Search.serveBm25(spark, fullRoot, queries,
      "q_id", "q_text", k = 5))
    assert(inc.nonEmpty && inc == full)
    // replay the same shard: MERGE by doc_id + delta-vs-old stats → no-op
    Search.indexUpsert(spark, shard, "doc_id", "text", incRoot)
    assert(stats(incRoot) == stats(fullRoot))
    assert(rows(Search.serveBm25(spark, incRoot, queries,
      "q_id", "q_text", k = 5)) == full)
  }

  test("indexUpsert: string-keyed corpora refresh through the string point read") {
    val v1 = Seq(("docA", "alpha beta gamma"), ("docB", "delta epsilon"))
      .toDF("doc_id", "text")
    val shard = Seq(("docB", "omega psi"), ("docC", "zeta eta"))
      .toDF("doc_id", "text") // one replacement + one fresh id
    val incRoot = tmp("bm25str")
    val fullRoot = tmp("bm25str2")
    Search.buildTextIndex(spark, v1, "doc_id", "text", incRoot)
    Search.indexUpsert(spark, shard, "doc_id", "text", incRoot)
    Search.buildTextIndex(spark,
      Seq(("docA", "alpha beta gamma"), ("docB", "omega psi"),
        ("docC", "zeta eta")).toDF("doc_id", "text"),
      "doc_id", "text", fullRoot)
    val queries = Seq((1L, "alpha"), (2L, "omega"), (3L, "zeta"),
      (4L, "delta")).toDF("q_id", "q_text")
    def serve(r: String) = Search.serveBm25(spark, r, queries,
      "q_id", "q_text", k = 5).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        x.getDouble(3))).toSet
    assert(serve(incRoot) == serve(fullRoot))
    assert(!serve(incRoot).exists(_._1 == 4L),
      "docB's old postings must not survive the string-keyed replacement")
  }

  test("indexUpsert: replay after a partial crash (dlens landed, postings didn't) converges") {
    import graft.offline.VersionedStore
    val rest = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("doc_id", "text")
    val shard = Seq((3L, "epsilon zeta epsilon"))
      .toDF("doc_id", "text")
    val incRoot = tmp("bm25crash")
    val fullRoot = tmp("bm25crash2")
    Search.buildTextIndex(spark, rest, "doc_id", "text", incRoot)
    // simulate the crash window: step 1 (the dlens MERGE) committed,
    // the postings write never happened
    val dlenShard = shard
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter($"term" =!= "")
      .groupBy("doc_id").agg(count(lit(1)).as("dlen"))
    VersionedStore.merge(dlenShard, s"$incRoot/dlens", Seq("doc_id"))
    // the at-least-once redelivery: ids are now present, so the
    // replay must take the (idempotent) MERGE path, not re-append
    Search.indexUpsert(spark, shard, "doc_id", "text", incRoot)
    Search.buildTextIndex(spark,
      Seq((1L, "alpha beta"), (2L, "gamma delta"),
        (3L, "epsilon zeta epsilon")).toDF("doc_id", "text"),
      "doc_id", "text", fullRoot)
    val queries = Seq((1L, "epsilon"), (2L, "alpha")).toDF("q_id", "q_text")
    assert(rows(Search.serveBm25(spark, incRoot, queries,
        "q_id", "q_text", k = 5)) ==
      rows(Search.serveBm25(spark, fullRoot, queries,
        "q_id", "q_text", k = 5)),
      "the crash-window replay must converge to the rebuilt index")
    def stats(r: String) = VersionedStore.read(spark, s"$r/stats")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(stats(incRoot) == stats(fullRoot),
      "stats recompute from the dlens head, never a stale delta")
  }

  test("indexUpsert: re-ingesting a doc with NEW text replaces its old postings") {
    val v1 = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val v2doc = Seq((1L, "omega psi")).toDF("doc_id", "text")
    val incRoot = tmp("bm25repl")
    val fullRoot = tmp("bm25repl2")
    Search.buildTextIndex(spark, v1, "doc_id", "text", incRoot)
    Search.indexUpsert(spark, v2doc, "doc_id", "text", incRoot)
    Search.buildTextIndex(spark,
      Seq((1L, "omega psi"), (2L, "delta epsilon zeta"))
        .toDF("doc_id", "text"),
      "doc_id", "text", fullRoot)
    val queries = Seq((1L, "alpha"), (2L, "omega"), (3L, "delta"))
      .toDF("q_id", "q_text")
    val inc = rows(Search.serveBm25(spark, incRoot, queries,
      "q_id", "q_text", k = 5))
    val full = rows(Search.serveBm25(spark, fullRoot, queries,
      "q_id", "q_text", k = 5))
    assert(inc == full, "stale postings must not survive replacement")
    assert(!inc.exists(_._1 == 1L), "doc 1 no longer contains 'alpha'")
  }

  test("StreamingSearchIndex: streamed ingest converges to the batch-built index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingSearchIndex
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("sbm25").toString
    val root = s"$base/idx"
    val seed = Seq((1L, "alpha beta gamma"), (2L, "delta beta zeta"))
    val b1 = Seq((3L, "alpha omega"), (4L, "beta beta gamma"))
    val b2 = Seq((5L, "zeta eta theta"))
    Search.buildTextIndex(spark, seed.toDF("doc_id", "text"),
      "doc_id", "text", root)
    val input = MemoryStream[(Long, String)]
    // compactEvery=1: every batch re-sorts the postings — the
    // long-running-stream layout shape
    val query = StreamingSearchIndex.start(
      input.toDF().toDF("doc_id", "text"), root, "doc_id", "text",
      s"$base/ckpt", compactEvery = 1, compactFiles = 2)
    input.addData(b1: _*)
    query.processAllAvailable()
    input.addData(b2: _*)
    query.processAllAvailable()
    query.stop()
    val fullRoot = tmp("sbm25full")
    Search.buildTextIndex(spark, (seed ++ b1 ++ b2).toDF("doc_id", "text"),
      "doc_id", "text", fullRoot)
    val queries = Seq((1L, "alpha"), (2L, "beta gamma"), (3L, "zeta"))
      .toDF("q_id", "q_text")
    val streamed = rows(Search.serveBm25(spark, root, queries,
      "q_id", "q_text", k = 5))
    val batch = rows(Search.serveBm25(spark, fullRoot, queries,
      "q_id", "q_text", k = 5))
    assert(streamed.nonEmpty && streamed == batch)
    // a replayed stream (fresh checkpoint, same content) must leave
    // the index unchanged — upsert idempotence carries exactly-once
    val input2 = MemoryStream[(Long, String)]
    val q2 = StreamingSearchIndex.start(
      input2.toDF().toDF("doc_id", "text"), root, "doc_id", "text",
      s"$base/ckpt2")
    input2.addData(b1 ++ b2: _*)
    q2.processAllAvailable()
    q2.stop()
    assert(rows(Search.serveBm25(spark, root, queries,
      "q_id", "q_text", k = 5)) == batch,
      "replay must not change the index")
  }

  test("compactTextIndex restores serve-side file pruning after upserts") {
    val (docs, queries) = corpusAndQueries()
    val root = tmp("bm25comp")
    Search.buildTextIndex(spark, docs.filter($"doc_id" % 10 =!= 3),
      "doc_id", "text", root)
    Search.indexUpsert(spark, docs.filter($"doc_id" % 10 === 3),
      "doc_id", "text", root)
    val before = rows(Search.serveBm25(spark, root, queries,
      "q_id", "q_text", k = 5))
    Search.compactTextIndex(spark, root)
    val allFiles = VersionedStore.read(spark, s"$root/postings")
      .inputFiles.toSet
    val statsFiles = VersionedStore.read(spark, s"$root/stats")
      .inputFiles.toSet
    val term = docs
      .select(element_at(split($"text", " "), 1).as("t"))
      .filter(length($"t") > 0)
      .first().getString(0)
    val oneTerm = Seq((1L, term)).toDF("q_id", "q_text")
    val opened = Search.serveBm25(spark, root, oneTerm, "q_id", "q_text",
      k = 5).inputFiles.toSet -- statsFiles
    assert(opened.nonEmpty && opened.size < allFiles.size,
      "compacted layout must prune a one-term serve again")
    assert(rows(Search.serveBm25(spark, root, queries,
      "q_id", "q_text", k = 5)) == before,
      "compaction must not change serve results")
  }

  test("indexDelete: serve and bulk equal a rebuild without the deleted docs") {
    val (docs, queries) = corpusAndQueries()
    val deadIds = docs.filter($"doc_id" % 9 === 2).select("doc_id")
    val delRoot = tmp("bm25del")
    val refRoot = tmp("bm25delref")
    Search.buildTextIndex(spark, docs, "doc_id", "text", delRoot)
    Search.indexDelete(spark, deadIds, "doc_id", delRoot)
    Search.buildTextIndex(spark,
      docs.join(deadIds, Seq("doc_id"), "left_anti"),
      "doc_id", "text", refRoot)
    val want = rows(Search.serveBm25(spark, refRoot, queries,
      "q_id", "q_text", k = 5))
    assert(want.nonEmpty)
    assert(rows(Search.serveBm25(spark, delRoot, queries,
      "q_id", "q_text", k = 5)) == want,
      "tombstoned serve must equal the rebuild (df and stats included)")
    assert(rows(Search.bm25TopKFromIndex(spark, delRoot, queries,
      "q_id", "q_text", k = 5)) == want,
      "the bulk path must honor tombstones too")
    def stats(r: String) = VersionedStore.read(spark, s"$r/stats")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(stats(delRoot) == stats(refRoot),
      "corpus stats must exclude deleted docs immediately")
    // replayed delete is a no-op
    Search.indexDelete(spark, deadIds, "doc_id", delRoot)
    assert(rows(Search.serveBm25(spark, delRoot, queries,
      "q_id", "q_text", k = 5)) == want)
  }

  test("indexDelete: compaction sweeps rows physically and keeps pruning + results") {
    val (docs, queries) = corpusAndQueries()
    val deadIds = docs.filter($"doc_id" % 9 === 2).select("doc_id")
    val root = tmp("bm25sweep")
    Search.buildTextIndex(spark, docs, "doc_id", "text", root)
    Search.indexDelete(spark, deadIds, "doc_id", root)
    val before = rows(Search.serveBm25(spark, root, queries,
      "q_id", "q_text", k = 5))
    Search.compactTextIndex(spark, root)
    // physically gone, not merely filtered
    val deadSet = deadIds.collect().map(_.getLong(0)).toSet
    val remaining = VersionedStore.read(spark, s"$root/postings")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(remaining.intersect(deadSet).isEmpty,
      "sweep must remove tombstoned postings from disk")
    assert(VersionedStore.read(spark, s"$root/dlens")
      .select("doc_id").collect().map(_.getLong(0)).toSet
      .intersect(deadSet).isEmpty, "sweep must remove tombstoned dlens")
    assert(rows(Search.serveBm25(spark, root, queries,
      "q_id", "q_text", k = 5)) == before,
      "sweep must not change serve results")
    // pruning preserved after the sweep
    val allFiles = VersionedStore.read(spark, s"$root/postings")
      .inputFiles.toSet
    val statsFiles = VersionedStore.read(spark, s"$root/stats")
      .inputFiles.toSet
    val term = docs
      .select(element_at(split($"text", " "), 1).as("t"))
      .filter(length($"t") > 0)
      .first().getString(0)
    val oneTerm = Seq((1L, term)).toDF("q_id", "q_text")
    val opened = Search.serveBm25(spark, root, oneTerm, "q_id", "q_text",
      k = 5).inputFiles.toSet -- statsFiles
    assert(opened.nonEmpty && opened.size < allFiles.size,
      "swept layout must still prune a one-term serve")
    // a second compaction takes the plain path (ledger retired)
    Search.compactTextIndex(spark, root)
    assert(rows(Search.serveBm25(spark, root, queries,
      "q_id", "q_text", k = 5)) == before)
  }

  test("indexDelete: re-ingesting a deleted doc re-activates it") {
    val v1 = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "zeta eta")).toDF("doc_id", "text")
    val root = tmp("bm25readd")
    val refRoot = tmp("bm25readdref")
    Search.buildTextIndex(spark, v1, "doc_id", "text", root)
    Search.indexDelete(spark, Seq(2L).toDF("doc_id"), "doc_id", root)
    // re-add with NEW text — must fully resurrect with the new content
    val readd = Seq((2L, "omega psi")).toDF("doc_id", "text")
    Search.indexUpsert(spark, readd, "doc_id", "text", root)
    Search.buildTextIndex(spark,
      Seq((1L, "alpha beta gamma"), (2L, "omega psi"), (3L, "zeta eta"))
        .toDF("doc_id", "text"), "doc_id", "text", refRoot)
    val queries = Seq((10L, "omega alpha"), (11L, "delta epsilon"))
      .toDF("q_id", "q_text")
    assert(rows(Search.serveBm25(spark, root, queries,
      "q_id", "q_text", k = 5)) ==
      rows(Search.serveBm25(spark, refRoot, queries,
        "q_id", "q_text", k = 5)))
    def stats(r: String) = VersionedStore.read(spark, s"$r/stats")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(stats(root) == stats(refRoot))
  }

  /** Brute-force gold for fuzzySearch: every (query, vocab word) pair
    * within Levenshtein distance maxEdits, with the word's df. */
  private def fuzzyGold(docs: org.apache.spark.sql.DataFrame,
                        queries: Seq[String], maxEdits: Int)
  : Set[(String, String, Long, Long)] = {
    val vocab = docs
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy("w").agg(countDistinct($"doc_id").as("df"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      q <- queries.distinct; (w, df) <- vocab
      dist = lev(q, w) if dist <= maxEdits
    } yield (q, w, dist.toLong, df)).toSet
  }

  test("fuzzySearch: deletion-neighborhood candidates recover EXACTLY the brute-force levenshtein pairs (e=1 and e=2)") {
    val docs = Seq(
      (1L, "grafted spark engine"),
      (2L, "crafted spark engines"),
      (3L, "graft sparks engine engine"),
      (4L, "drafted snark engine"),
      (5L, "wholly unrelated words"),
      (6L, "graphed spark enginx")
    ).toDF("doc_id", "text")
    for (e <- Seq(1, 2)) {
      val queries = Seq("grafted", "spark", "engine", "zzzz").toDF("q")
      val got = Search.fuzzySearch(docs, "doc_id", "text", queries, "q",
          maxEdits = e)
        .collect()
        .map(r => (r.getAs[String]("query_term"), r.getAs[String]("word"),
          r.getAs[Long]("dist"), r.getAs[Long]("df"))).toSet
      assert(got == fuzzyGold(docs, Seq("grafted", "spark", "engine", "zzzz"), e),
        s"maxEdits=$e")
    }
  }

  test("fuzzySearch: duplicate query terms collapse; no-match queries emit nothing; e=2 reaches transpositions") {
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val queries = Seq("alpah", "alpah", "qqqqqq").toDF("q")
    val got = Search.fuzzySearch(docs, "doc_id", "text", queries, "q",
        maxEdits = 2)
      .collect()
      .map(r => (r.getAs[String]("query_term"), r.getAs[String]("word"),
        r.getAs[Long]("dist"))).toSet
    // "alpah" transposes alpha's last two chars: plain levenshtein 2
    // (two substitutions), reached via the 2-deletion neighborhood
    // (both sides delete down to "alp").
    assert(got == Set(("alpah", "alpha", 2L)))
  }
}
