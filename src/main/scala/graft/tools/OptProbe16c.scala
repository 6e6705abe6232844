package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.operators.{Dedup, FeatureEng, TextAnalysis}

/** Round-16 follow-up decompositions: the pretrain capstone prefix
  * (the trio's dominant shared stage), the post-change tfidf
  * residual, and q_doremi_mix — each stage checkpoint-isolated with
  * job/stage counts, the OptProbe16 methodology. */
object OptProbe16c {
  private val jobs = new AtomicInteger
  private val stages = new AtomicInteger

  def time[T](name: String)(f: => T): T = {
    val j0 = jobs.get(); val s0 = stages.get()
    val t0 = System.nanoTime(); val r = f
    println(f"[oprobe16c] $name%-48s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
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

    // ---- pretrain capstone prefix (mirrors pretrainTrainPool) ------
    val clean0 = TextAnalysis.cleanFilter(docs, "doc_id", "text",
      minWords = 20, maxWords = 100000, minAvgWordLen = 2.0,
      maxAvgWordLen = 12.0, maxDigitRatio = 0.3, maxStopwordRatio = 0.12)
    time("pool: cleanFilter (noop)") { noop(clean0) }
    val sdocs = docs.join(
      clean0.select("doc_id", "n_words", "quality_score"), "doc_id")
      .localCheckpoint(true)
    time("pool: sdocs ckpt (2nd warm)") {
      noop(docs.join(clean0.select("doc_id", "n_words", "quality_score"),
        "doc_id")) }
    time("pool: exact dedup winners") {
      noop(Dedup.exact(sdocs, "doc_id", "text")
        .select(col("canonical_id").as("doc_id"))) }
    val winners = Dedup.exact(sdocs, "doc_id", "text")
      .select(col("canonical_id").as("doc_id"))
    val dd = sdocs.join(winners, Seq("doc_id"), "left_semi")
    val evalDocs = docs.filter(col("doc_id") % 10 === 0)
    val trainPool = dd.filter(col("doc_id") % 10 =!= 0)
      .localCheckpoint(true)
    time("pool: decontaminationScores over ckpt pool") {
      noop(Dedup.decontaminationScores(trainPool, "doc_id", "text",
        evalDocs, "doc_id", "text", n = 3)) }
    val flagged = Dedup.decontaminationScores(trainPool, "doc_id",
        "text", evalDocs, "doc_id", "text", n = 3)
      .filter(col("contam_frac") >= 0.8)
    val pool = trainPool.join(flagged.select("doc_id"),
      Seq("doc_id"), "left_anti").localCheckpoint(true)
    time("pool: selectToBudget over ckpt pool") {
      noop(FeatureEng.selectToBudget(pool, "doc_id",
        col("quality_score"), col("n_words"), budgetTokens = 20000L)) }
    time("q_pretrain_pipeline full (1st)") {
      noop(SparkEntry.queries("q_pretrain_pipeline")(spark, d)) }
    time("q_pretrain_pipeline full (2nd)") {
      noop(SparkEntry.queries("q_pretrain_pipeline")(spark, d)) }

    // ---- post-change tfidf residual --------------------------------
    time("q_tfidf_cosine full (1st)") {
      noop(SparkEntry.queries("q_tfidf_cosine")(spark, d)) }
    time("q_tfidf_cosine full (2nd)") {
      noop(SparkEntry.queries("q_tfidf_cosine")(spark, d)) }
    time("q_bm25 full (2nd)") {
      noop(SparkEntry.queries("q_bm25")(spark, d)) }

    // ---- doremi ----------------------------------------------------
    time("q_doremi_weights full") {
      noop(SparkEntry.queries("q_doremi_weights")(spark, d)) }
    time("q_doremi_mix full (1st)") {
      noop(SparkEntry.queries("q_doremi_mix")(spark, d)) }
    time("q_doremi_mix full (2nd)") {
      noop(SparkEntry.queries("q_doremi_mix")(spark, d)) }
    spark.stop()
  }
}
