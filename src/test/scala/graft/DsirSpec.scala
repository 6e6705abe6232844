package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

/** DSIR importance resampling: hashed-ngram feature extraction,
  * weight directionality, partition-independence, and the seeded
  * Gumbel top-k selection contract.
  */
class DsirSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    // target slice: "wiki"-flavoured
    (0L, "the solar system has eight planets orbiting the sun", true),
    (1L, "planets orbit the sun in the solar system", true),
    // raw docs: one solar-ish, one spam-ish, one empty
    (2L, "the solar system contains planets and the sun", false),
    (3L, "buy cheap pills online now best price cheap pills", false),
    (4L, "", false)
  ).toDF("doc_id", "text", "is_target")

  test("hashedNgramCounts: unigrams + bigrams, counts exact") {
    // huge bucket space -> collisions virtually impossible, so rows =
    // distinct grams and sum(cnt) = total grams = 2*words - 1
    val f = Dsir.hashedNgramCounts(
      Seq((7L, "a b a b")).toDF("id", "txt"), "id", "txt", 1 << 30)
    val rows = f.collect()
    // grams: a,b,a,b + "a b","b a","a b" -> distinct {a, b, a b, b a}
    assert(rows.length == 4)
    assert(rows.map(_.getLong(2)).sum == 7)
    assert(rows.map(_.getLong(2)).max == 2) // "a" x2, "b" x2, "a b" x2
  }

  test("hashedNgramCounts: short and empty docs are guarded") {
    val f = Dsir.hashedNgramCounts(
      Seq((1L, "solo"), (2L, ""), (3L, "  ")).toDF("id", "txt"),
      "id", "txt", 1024)
    val byDoc = f.groupBy("doc_id").agg(sum("cnt")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc == Map(1L -> 1L)) // one unigram, no bigram, no empties
  }

  test("importanceWeights: target-like docs outweigh off-domain docs") {
    val rows = Dsir.importanceWeights(corpus, "doc_id", "text",
      col("is_target"), nBuckets = 10000, alpha = 1.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // doc 2 shares its vocabulary with the target; doc 3 shares none.
    // Weights are length-dependent, so compare per-gram averages.
    def perGram(id: Long) = rows(id)._2 / rows(id)._1
    assert(perGram(2L) > perGram(3L),
      s"solar doc must score above spam doc per-gram: $rows")
    assert(!rows.contains(4L), "empty doc must have no weight row")
  }

  test("importanceWeights: pure function of content (partitioning-proof)") {
    val a = Dsir.importanceWeights(corpus, "doc_id", "text",
      col("is_target"), 512, 1.0).collect().toSet
    val b = Dsir.importanceWeights(corpus.repartition(7), "doc_id",
      "text", col("is_target"), 512, 1.0).collect().toSet
    assert(a == b)
  }

  test("resample: k rows, a subset of the weights, seed-deterministic") {
    val w = Dsir.importanceWeights(corpus, "doc_id", "text",
      col("is_target"), 10000, 1.0)
    val s1 = Dsir.resample(w, k = 2, seed = "epoch1").collect()
    val s2 = Dsir.resample(w, k = 2, seed = "epoch1").collect()
    assert(s1.length == 2 && s1.sameElements(s2),
      "same seed must reproduce the same sample in the same order")
    val ids = w.select("doc_id").as[Long].collect().toSet
    assert(s1.map(_.getLong(0)).forall(ids.contains))
    // k >= corpus: everyone selected, ordered by key
    val all = Dsir.resample(w, k = 100, seed = "epoch1").collect()
    assert(all.length == ids.size)
    val keys = all.map(_.getDouble(3))
    assert(keys.sameElements(keys.sortBy(-_)), "must be key-descending")
  }

  test("scoreFrozen: bit-equal to importanceWeights when frozen from the corpus") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val tgt = col("source").isin("src0", "src1")
    val model = Dsir.freezeModel(docs, "doc_id", "text", tgt, 10000, 1.0)
    val frozen = Dsir.scoreFrozen(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val batch = Dsir.importanceWeights(docs, "doc_id", "text", tgt,
      10000, 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(frozen == batch,
      s"frozen/batch divergence: ${(frozen -- batch).take(3)} vs ${(batch -- frozen).take(3)}")
  }

  test("scoreFrozen: pure projection (no join/aggregate/exchange) and unseen grams are neutral") {
    // huge bucket space: the unseen doc's grams must not collide with
    // an occupied bucket (model size is occupancy-bounded regardless)
    val model = Dsir.freezeModel(corpus, "doc_id", "text",
      col("is_target"), 1 << 26, 1.0)
    val newDocs = Seq((10L, "the solar system"),
      (11L, "zzqx unseen tokens only")).toDF("doc_id", "text")
    val scored = Dsir.scoreFrozen(newDocs, "doc_id", "text", model)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join") &&
      !plan.contains("Aggregate"),
      s"frozen scoring must be one projection:\n$plan")
    val rows = scored.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // doc 11's grams never occur in the frozen corpus -> weight 0,
    // but its grams still count
    assert(rows(11L)._1 == 7L && rows(11L)._2 == 0.0, s"got $rows")
    assert(rows(10L)._2 != 0.0)
  }

  test("scoreFrozen runs stateless on a stream, equals the batch frozen path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val model = Dsir.freezeModel(corpus, "doc_id", "text",
      col("is_target"), 1024, 1.0)
    val rows = Seq((20L, "planets orbit the sun"),
      (21L, "buy cheap pills online"), (22L, ""))
    val input = MemoryStream[(Long, String)]
    // append mode with NO watermark: the plan carries no state
    val query = Dsir.scoreFrozen(input.toDS().toDF("doc_id", "text"),
        "doc_id", "text", model)
      .writeStream.format("memory").queryName("sdsir")
      .outputMode(OutputMode.Append()).start()
    input.addData(rows: _*)
    query.processAllAvailable()
    val streamed = spark.table("sdsir").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    query.stop()
    val batch = Dsir.scoreFrozen(rows.toDF("doc_id", "text"),
        "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(streamed == batch && !streamed.exists(_._1 == 22L),
      s"stream/batch divergence:\n$streamed\n$batch")
  }

  test("HashedGramBuckets equals the column-pipeline bucketing on tricky strings") {
    // the byte-level tokenizer must agree with
    // filter(split(text,' '), <> '') + concat_ws bigrams + md5Hash31
    // on every edge: runs of spaces, leading/trailing, unicode
    // multi-byte, non-space whitespace INSIDE a word, empty text
    import graft.functions.{Fns, HashedGramScore}
    val texts = Seq("a b c", "a  b", " leading", "trailing ", "",
      " ", "héllo wörld 😀 mix",
      "tab\tinside word", "double  space  runs  everywhere")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val viaExpr = df.select(col("id"),
        explode(HashedGramScore.buckets(col("text"), 4096)).as("b"))
      .groupBy("id", "b").count().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ws = filter(split(col("text"), " "), w => w =!= lit(""))
    val bi = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    val viaCols = df.select(col("id"), explode(concat(ws, bi)).as("g"))
      .select(col("id"), (Fns.md5Hash31(col("g")) % 4096).as("b"))
      .groupBy("id", "b").count().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaExpr == viaCols,
      s"divergence: ${(viaExpr -- viaCols).take(4)} vs ${(viaCols -- viaExpr).take(4)}")
  }

  test("persisted model store: additive shard refresh, replay-idempotent, freeze == full refit") {
    val root = java.nio.file.Files.createTempDirectory("dsirstore")
      .toString + "/model"
    val bulk = corpus.filter(col("doc_id") < 3)
    val shard = corpus.filter(col("doc_id") >= 3)
    Dsir.buildModelStore(bulk, "doc_id", "text", col("is_target"), root,
      nBuckets = 2048, alpha = 1.0)
    assert(Dsir.upsertModelCounts(shard, "doc_id", "text",
      col("is_target"), root, "shard-1"), "first apply must ingest")
    assert(!Dsir.upsertModelCounts(shard, "doc_id", "text",
      col("is_target"), root, "shard-1"), "replay must be a no-op")
    val incremental = Dsir.freezeFromStore(spark, root)
    val full = Dsir.freezeModel(corpus, "doc_id", "text",
      col("is_target"), 2048, 1.0)
    assert(incremental == full,
      "incrementally-maintained model must equal the full refit")
  }

  test("dsir count-store retraction: frozen model equals never-ingested; generation cycle works") {
    val root = java.nio.file.Files.createTempDirectory("dsirretract")
      .toString + "/model"
    val bulk = corpus.filter(col("doc_id") < 3)
    val shard = corpus.filter(col("doc_id") >= 3)
    Dsir.buildModelStore(bulk, "doc_id", "text", col("is_target"), root,
      nBuckets = 2048, alpha = 1.0)
    assert(Dsir.upsertModelCounts(shard, "doc_id", "text",
      col("is_target"), root, "s1"))
    assert(Dsir.retractModelCounts(shard, "doc_id", "text",
      col("is_target"), root, "s1"))
    assert(Dsir.freezeFromStore(spark, root) ==
      Dsir.freezeModel(bulk, "doc_id", "text", col("is_target"),
        2048, 1.0),
      "retracted store must freeze the never-ingested model")
    assert(!Dsir.retractModelCounts(shard, "doc_id", "text",
      col("is_target"), root, "s1"), "double retraction no-ops")
    assert(!Dsir.retractModelCounts(shard, "doc_id", "text",
      col("is_target"), root, "never-seen"))
    assert(Dsir.upsertModelCounts(shard, "doc_id", "text",
      col("is_target"), root, "s1"), "re-ingest after retraction")
    assert(Dsir.freezeFromStore(spark, root) ==
      Dsir.freezeModel(corpus, "doc_id", "text", col("is_target"),
        2048, 1.0))
  }

  test("StreamingDsir: micro-batch count ingest, replay-safe, freeze == full refit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("sdsir").toString
    val root = s"$tmp/model"
    val isTarget = col("doc_id") <= 1
    val seed = corpus.select(col("doc_id"), col("text"))
    Dsir.buildModelStore(seed, "doc_id", "text", isTarget, root,
      nBuckets = 512, alpha = 1.0)
    val b1 = Seq((5L, "planets are bright tonight"),
      (6L, "cheap pills cheap pills"))
    val b2 = Seq((7L, "the sun and the planets"))
    val input = MemoryStream[(Long, String)]
    val query = graft.streaming.StreamingDsir.writer(
        input.toDS().toDF("doc_id", "text"), root, isTarget)
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    input.addData(b1: _*); query.processAllAvailable()
    input.addData(b2: _*); query.processAllAvailable()
    query.stop()
    // a crash-replay of batch 0 must be a ledger no-op
    assert(!Dsir.upsertModelCounts(b1.toDF("doc_id", "text"), "doc_id",
      "text", isTarget, root, "batch-0"))
    val incremental = Dsir.freezeFromStore(spark, root)
    val full = Dsir.freezeModel(
      seed.unionByName(b1.toDF("doc_id", "text"))
        .unionByName(b2.toDF("doc_id", "text")),
      "doc_id", "text", isTarget, 512, 1.0)
    assert(incremental == full,
      "stream-maintained model must equal the full refit over all docs")
  }

  test("q_dsir plan: distribution tables broadcast, corpus never cartesians") {
    val df = SparkEntry.qDsir(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian allowed:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"lr/totals tables must broadcast:\n$plan")
    // the selection step stays a distributed top-k, not a global sort
    val sPlan = SparkEntry.qDsirSample(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(sPlan.contains("TakeOrderedAndProject"),
      s"resample must be TakeOrderedAndProject:\n$sPlan")
  }
}
