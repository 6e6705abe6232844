package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.functions.Fns
import graft.operators.{Dedup, Sketch, Unigram}

/** Round-16 stage decompositions (same-JVM, checkpoint-isolated — the
  * RetrievalProbe2 methodology) for the VERDICT r15 "next round"
  * items that need probe-committed evidence rather than assertion:
  *
  *  1. q_dedup_clusters — detection vs label-propagation loop, with
  *     JOB and STAGE counts per block (is the floor scheduling
  *     latency or compute?), plus an A/B of a 3-shuffle union-based
  *     propagate step against the shipped 4-shuffle join+left-join
  *     (result equality asserted).
  *  2. q_distinct_hll / q_slice_overlap — is the explode+distinct
  *     the wall, and is the pre-exchange aggregation map-side
  *     combining?
  *  3. q_top_ngrams / q_unigram_sample / q_trust_select /
  *     q_ccnet_pipeline — seam timings + job/stage counts, upgrading
  *     their r15 EXAMINED rows to FLOOR-with-numbers.
  */
object OptProbe16 {
  private val jobs = new AtomicInteger
  private val stages = new AtomicInteger

  def time[T](name: String)(f: => T): T = {
    val j0 = jobs.get(); val s0 = stages.get()
    val t0 = System.nanoTime(); val r = f
    println(f"[oprobe16] $name%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
      f"  jobs=${jobs.get() - j0}%3d stages=${stages.get() - s0}%3d")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, d)

    // ================= 1. q_dedup_clusters =========================
    val pairs0 = Dedup.ngramJaccard(docs, "doc_id", "text",
      n = 3, threshold = 0.8, maxDf = 100)
    time("clusters: detection (ngramJaccard) ckpt 1st") {
      pairs0.localCheckpoint(true) }
    val pairs = time("clusters: detection ckpt (2nd, warm)") {
      pairs0.localCheckpoint(true) }
    println(s"[oprobe16] pair rows = ${pairs.count()}")
    val shipped1 = time("clusters: shipped loop (1st)") {
      Dedup.clusters(pairs).localCheckpoint(true) }
    time("clusters: shipped loop (2nd)") { noop(Dedup.clusters(pairs)) }
    val union1 = time("clusters: union-propagate loop (1st)") {
      clustersUnion(pairs).localCheckpoint(true) }
    time("clusters: union-propagate loop (2nd)") { noop(clustersUnion(pairs)) }
    val dDiff = shipped1.exceptAll(union1).count() +
      union1.exceptAll(shipped1).count()
    println(s"[oprobe16] clusters shipped-vs-union diff rows = $dDiff")

    // ================= 2. q_distinct_hll / q_slice_overlap =========
    val sh0 = docs.select(col("source"),
      explode(Fns.shingles(col("text"), 3)).as("shingle"))
    time("hll: shingle explode alone (noop)") { noop(sh0) }
    val sh = time("hll: shingle explode eager ckpt") { sh0.localCheckpoint(true) }
    println(s"[oprobe16] shingle instance rows = ${sh.count()}")
    time("hll: regs agg over ckpt stream") {
      noop(Sketch.hllDistinct(sh, "shingle", Seq("source"), p = 8)
        .select("source", "hll_estimate")) }
    time("hll: exact countDistinct over ckpt stream") {
      noop(sh.groupBy("source").agg(countDistinct(col("shingle")))) }
    time("hll: distinct (source, shingle) over ckpt stream") {
      noop(sh.distinct()) }
    time("q_distinct_hll full (shipped, 1st)") {
      noop(SparkEntry.queries("q_distinct_hll")(spark, d)) }
    time("q_distinct_hll full (shipped, 2nd)") {
      noop(SparkEntry.queries("q_distinct_hll")(spark, d)) }
    time("kmv: distinct (slice, md5) over ckpt stream") {
      noop(sh.select(col("source").as("slice"),
        md5(col("shingle")).as("h")).distinct()) }
    time("q_slice_overlap full (shipped, 1st)") {
      noop(SparkEntry.queries("q_slice_overlap")(spark, d)) }
    time("q_slice_overlap full (shipped, 2nd)") {
      noop(SparkEntry.queries("q_slice_overlap")(spark, d)) }

    // ================= 3. EXAMINED multi-second rows ================
    val ws = filter(Fns.words(col("text")), w => w =!= "")
    val idx = when(size(ws) >= 3, sequence(lit(1), size(ws) - 2))
      .otherwise(array())
    val grams0 = docs.select(col("doc_id").as("doc_id"),
      explode(transform(idx, i => array_join(slice(ws, i, lit(3)), " ")))
        .as("ngram"))
    time("top_ngrams: gram explode alone (noop)") { noop(grams0) }
    val grams = grams0.localCheckpoint(true)
    time("top_ngrams: (ngram, doc) agg over ckpt") {
      noop(grams.groupBy("ngram", "doc_id").agg(count(lit(1)))) }
    time("top_ngrams: full two-level agg + top-k over ckpt") {
      noop(grams.groupBy("ngram", "doc_id").agg(count(lit(1)).as("occ"))
        .groupBy("ngram").agg(count(lit(1)).as("df"), sum("occ").as("cnt"))
        .orderBy(col("df").desc, col("cnt").desc, col("ngram").asc)
        .limit(50)) }
    time("q_top_ngrams full (shipped, 1st)") {
      noop(SparkEntry.queries("q_top_ngrams")(spark, d)) }
    time("q_top_ngrams full (shipped, 2nd)") {
      noop(SparkEntry.queries("q_top_ngrams")(spark, d)) }

    val model = time("unigram_sample: train (3 rounds) + collect") {
      Unigram.collectCosts(Unigram.train(docs, "doc_id", "text",
        vocabSize = 96, maxPieceLen = 4, rounds = 3).vocab) }
    time("unigram_sample: encodeDocsSampled given model") {
      noop(Unigram.encodeDocsSampled(docs, "doc_id", "text", model,
        maxPieceLen = 4, alphaMicro = 500000L, seed = 11L)) }
    time("q_unigram_sample full (shipped, 2nd)") {
      noop(SparkEntry.queries("q_unigram_sample")(spark, d)) }

    time("trust_select: qTrustRank alone (1st)") {
      noop(SparkEntry.queries("q_trustrank")(spark, d)) }
    time("trust_select: qTrustRank alone (2nd)") {
      noop(SparkEntry.queries("q_trustrank")(spark, d)) }
    time("q_trust_select full (shipped, 1st)") {
      noop(SparkEntry.queries("q_trust_select")(spark, d)) }
    time("q_trust_select full (shipped, 2nd)") {
      noop(SparkEntry.queries("q_trust_select")(spark, d)) }

    time("q_ccnet_pipeline full (shipped, 1st)") {
      noop(SparkEntry.queries("q_ccnet_pipeline")(spark, d)) }
    time("q_ccnet_pipeline full (shipped, 2nd)") {
      noop(SparkEntry.queries("q_ccnet_pipeline")(spark, d)) }

    // residual decomposition of the post-change retrieval rows
    time("q_bm25 full (shipped, 1st)") {
      noop(SparkEntry.queries("q_bm25")(spark, d)) }
    time("q_bm25 full (shipped, 2nd)") {
      noop(SparkEntry.queries("q_bm25")(spark, d)) }
    time("q_tfidf_cosine full (shipped, 2nd)") {
      noop(SparkEntry.queries("q_tfidf_cosine")(spark, d)) }

    spark.stop()
  }

  /** [[Dedup.clusters]] with the propagate step rewritten as
    * union + one groupBy (min over self ∪ neighbor labels) instead of
    * neighbor-groupBy + left join — one fewer shuffle op and fewer
    * AQE stages per half-round; the pointer jump and the fused
    * 2-half-rounds-per-job convergence loop are unchanged. Identical
    * labels by construction: min(self ∪ neighbors) =
    * least(label, coalesce(min(neighbors), label)). */
  private def clustersUnion(pairsIn: DataFrame, maxIters: Int = 20)
  : DataFrame = {
    val edges = pairsIn.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairsIn.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).cache()
    def halfRound(lbl: DataFrame): DataFrame = {
      val neighbor = edges
        .join(lbl.select(col("id").as("dst"), col("label").as("nlabel")),
          Seq("dst"))
        .select(col("src").as("id"),
          lit(null).cast("long").as("old"), col("nlabel").as("label"))
      val propagated = lbl.select(col("id"), col("old"), col("label"))
        .unionByName(neighbor)
        .groupBy("id")
        .agg(max(col("old")).as("old"), min(col("label")).as("label"))
      propagated.join(
          propagated.select(col("id").as("label"), col("label").as("plabel")),
          Seq("label"), "left_outer")
        .select(col("id"), col("old"),
          least(col("label"), coalesce(col("plabel"), col("label")))
            .as("label"))
    }
    var cachedHandle = labels
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val once = halfRound(
        labels.select(col("id"), col("label").as("old"), col("label")))
        .cache()
      val fused = halfRound(once)
      val next = fused.localCheckpoint(false)
      val changedRow = next
        .agg(sum(when(col("label") =!= col("old"), 1L).otherwise(0L))).head()
      val changed = if (changedRow.isNullAt(0)) 0L else changedRow.getLong(0)
      once.unpersist()
      cachedHandle.unpersist()
      cachedHandle = next
      labels = next.drop("old")
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }
}
