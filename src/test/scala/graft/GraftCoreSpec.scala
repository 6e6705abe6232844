package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

class GraftCoreSpec extends AnyFunSuite with BeforeAndAfterAll {
  import graft.operators.{AsofJoin, Sessionize}
  import org.apache.spark.sql.functions._

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("every declared query returns rows and matching columns on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, TestSpark.sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql covers every query (or is intentionally rows-only)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // minhash needs xxhash64, simhash an FNV word fold, ivf and
    // semdedup a trained KMeans, PQ its Lloyd codebooks, BPE an
    // iterative argmax-merge loop, unigram training ln-based EM
    // costs, the fastText-style classifier gradient descent — none
    // expressible in portable DuckDB SQL; spec-tested (BPE and
    // unigram are held to naive in-memory references in BpeSpec /
    // UnigramSpec, PQ encode/ADC to one in LlmPipelineSpec, the ft
    // fit to a sequential reference bit for bit in ClassifySpec).
    val known = Set("q_dedup_minhash", "q_dedup_simhash",
      "q_dedup_simhash_wide", "q_ann_ivf", "q_ann_pq",
      "q_dedup_semdedup",
      "q_bpe_merges", "q_bpe_encode", "q_bpe_encode_oov",
      "q_unigram_train", "q_unigram_sample", "q_ft_quality",
      "q_ft_langid") // softmax GD — same class as q_ft_quality
    assert(noOracle.subsetOf(known), s"missing oracle for: $noOracle")
  }

  test("ngram oracle precondition: gate corpora max shingle df <= declared maxDf") {
    // qDedupNgram/qDedupKeeplist declare maxDf=100 while their DuckDB
    // oracles are uncapped; they agree only while NO shingle in the
    // gate corpus exceeds the cap. Assert that here so a test-data
    // refresh with heavier duplication fails loudly instead of
    // silently diverging query from oracle.
    val declaredMaxDf = 100L // keep in sync with SparkEntry.qDedupNgram
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(s"$dir/documents.parquet").exists()) {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val maxDf = docs.select(explode(
            graft.functions.ShingleHash.shingles(col("text"), 3)).as("s"))
          .groupBy("s").count().agg(max("count")).head().getLong(0)
        assert(maxDf <= declaredMaxDf,
          s"$sf: max shingle df $maxDf exceeds declared maxDf " +
            s"$declaredMaxDf — the capped queries would diverge from " +
            "their uncapped oracles; raise maxDf in SparkEntry (and " +
            "here) or regenerate the corpus")
      }
    }
  }

  test("overlap-spans oracle precondition: gate corpora max shingle occurrences <= declared maxDf") {
    // qOverlapSpans declares maxDf=100 while its DuckDB oracle is
    // uncapped; overlapSpans' cap counts OCCURRENCES of a shingle
    // across the corpus (the positional stream is NOT per-doc
    // deduplicated — see Dedup.overlapSpans scaladoc), a strictly
    // tighter bound than ngram's per-doc df. Assert the gate corpora
    // stay under it so a test-data refresh fails loudly instead of
    // silently diverging query from oracle.
    val declaredMaxDf = 100L // keep in sync with SparkEntry.qOverlapSpans
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(s"$dir/documents.parquet").exists()) {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        // Mirror Dedup.positionalShingles: every occurrence counts.
        val maxOcc = docs
          .select(org.apache.spark.sql.functions.split(col("text"), " ").as("ws"))
          .where(org.apache.spark.sql.functions.size(col("ws")) >= 3)
          .select(explode(org.apache.spark.sql.functions.expr(
            "transform(sequence(1, size(ws) - 2), " +
              "i -> xxhash64(concat_ws(' ', ws[i - 1], ws[i], ws[i + 1])))"))
            .as("s"))
          .groupBy("s").count().agg(max("count")).head().getLong(0)
        assert(maxOcc <= declaredMaxDf,
          s"$sf: max shingle occurrence count $maxOcc exceeds declared " +
            s"maxDf $declaredMaxDf — q_overlap_spans would diverge from " +
            "its uncapped oracle; raise maxDf in SparkEntry (and here) " +
            "or regenerate the corpus")
      }
    }
  }

  test("frozen-vocab oracle precondition: gate corpora distinct words <= declared topK") {
    // q_quality_filter_frozen shares q_quality_filter's oracle ONLY
    // while freezeVocabulary(topK = 1,000,000) truncates nothing — a
    // corpus refresh with a larger vocabulary would silently shift
    // truncated words onto the OOV fallback and diverge lm scores.
    val declaredTopK = 1000000L // keep in sync with qQualityFilterFrozen
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(s"$dir/documents.parquet").exists()) {
        val distinctWords = spark.read.parquet(s"$dir/documents.parquet")
          .select(explode(org.apache.spark.sql.functions
            .split(col("text"), " ")).as("w"))
          .distinct().count()
        assert(distinctWords <= declaredTopK,
          s"$sf: $distinctWords distinct words exceed the declared " +
            s"topK $declaredTopK — the frozen classifier would " +
            "truncate and diverge from the shared batch oracle")
      }
    }
  }

  test("asof join: floor semantics, equal-ts inclusion, default fill") {
    val features = Seq(
      ("u1", ts("2024-01-01 00:00:00"), "f", 1.0),
      ("u1", ts("2024-01-03 00:00:00"), "f", 3.0),
      ("u2", ts("2024-01-05 00:00:00"), "f", 5.0)
    ).toDF("entity_id", "ts", "feature_name", "value_float")
    val labels = Seq(
      ("u1", ts("2024-01-02 00:00:00"), 10L, 1.0), // between f=1 and f=3
      ("u1", ts("2024-01-03 00:00:00"), 11L, 0.0), // exactly at f=3 → included
      ("u2", ts("2024-01-04 00:00:00"), 12L, 1.0), // before any feature → default
      ("u3", ts("2024-01-04 00:00:00"), 13L, 1.0)  // entity with no features
    ).toDF("entity_id", "ts", "event_id", "value")

    val out = AsofJoin.pointInTime(features, labels,
      "entity_id", "ts", "feature_name", "value_float", "event_id", "value",
      Seq("f"), default = -1.0)
      .collect().map(r => r.getAs[Long]("label_id") -> r.getAs[Double]("f_f"))
      .toMap
    assert(out(10L) == 1.0)
    assert(out(11L) == 3.0)
    assert(out(12L) == -1.0)
    assert(out(13L) == -1.0)
  }

  test("sessionize: gap splits sessions, aggregates are per-session") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "click", 1.0, ""),
      (2L, ts("2024-01-01 00:10:00"), 7L, "click", 2.0, ""),
      (3L, ts("2024-01-01 05:00:00"), 7L, "click", 4.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Sessionize.sessions(ev, "user_id", "ts", "value", 3600L)
      .orderBy("session_seq").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(0).getAs[Double]("session_value") == 3.0)
    assert(out(1).getAs[Long]("n_events") == 1)
  }

  test("md5Hash31 matches the reference hash algorithm") {
    import graft.functions.Fns
    // reference: int(hashlib.md5(key).hexdigest()[:8], 16) % 2**31
    def ref(key: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 2147483648L
    }
    val keys = Seq("click,view,error,signup", "merchant", "a", "")
    val got = keys.toDF("k").select(Fns.md5Hash31(col("k"))).as[Long].collect()
    keys.zip(got).foreach { case (k, g) => assert(g == ref(k), s"key=$k") }
  }

  test("materializeVectors: defaults counted, schema order fixed") {
    import graft.offline.OfflineStore
    val recs = Seq(
      ("user", "u1", "a", 1.0, ts("2024-01-01 00:00:00"), 1L),
      ("user", "u1", "a", 2.0, ts("2024-01-02 00:00:00"), 2L),
      ("user", "u1", "b", 9.0, ts("2024-01-01 00:00:00"), 3L)
    ).toDF("entity_type", "entity_id", "feature_name", "value_float",
           "event_time", "commit_id")
    val out = OfflineStore.materializeVectors(recs, Seq("a", "b", "c"), 0.0)
      .collect().head
    assert(out.getAs[Double]("f_a") == 2.0) // latest wins
    assert(out.getAs[Double]("f_b") == 9.0)
    assert(out.getAs[Double]("f_c") == 0.0) // default
    assert(out.getAs[Int]("n_default") == 1)
  }
}
