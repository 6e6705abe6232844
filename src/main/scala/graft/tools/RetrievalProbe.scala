package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Stage-by-stage cost decomposition of the retrieval rankers at a
  * given sf dir — which part of the scorer actually costs (tokenize,
  * fan-out join, decimal aggregate, top-k window). Run when a bench
  * row for the retrieval family moves.
  */
object RetrievalProbe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[rprobe] $name%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
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
    val docs = Tables.documents(spark, d)
    val queries = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("q_id"),
        array_join(slice(split(col("text"), " "), 1, 8), " ").as("q_text"))

    def words(c: org.apache.spark.sql.Column) = split(c, " ")
    val tf0 = docs.select(col("doc_id"),
        explode(words(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    time("tf aggregate (count)")(tf0.count())
    val tf = tf0.localCheckpoint(false)
    time("tf checkpoint materialize")(tf.count())
    val dlen = tf.groupBy("doc_id").agg(sum("tf").as("dlen"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qterms = queries
      .select(col("q_id"), explode(words(col("q_text"))).as("term"))
      .filter(col("term") =!= "").distinct().localCheckpoint(false)
    time("qterms materialize")(qterms.count())
    val enriched = tf
      .join(broadcast(dfreq.join(
        broadcast(qterms.select("term").distinct()), "term")), "term")
      .join(dlen, "doc_id")
    time("enriched postings (count)")(enriched.count())
    val matched = enriched.join(broadcast(qterms), "term")
    time("fan-out matched (count)")(matched.count())
    val k1 = 1.2; val b = 0.75
    val stats = dlen.agg(count(lit(1)).as("n_docs"),
      sum("dlen").as("total_len"))
    val avgdl = col("total_len").cast("double") / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfc = (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dlen") / avgdl))
    val contrib = matched.crossJoin(broadcast(stats))
      .withColumn("c", round(idf * tfc, 6).cast("decimal(38,6)"))
    val aggDec = contrib.groupBy("q_id", "doc_id")
      .agg(round(sum("c").cast("double"), 6).as("score"))
    time("decimal agg (count)")(aggDec.count())
    val aggDbl = matched.crossJoin(broadcast(stats))
      .withColumn("c", round(idf * tfc, 6))
      .groupBy("q_id", "doc_id")
      .agg(round(sum("c"), 6).as("score"))
    time("double agg (count) [A/B only]")(aggDbl.count())
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("doc_id"))
    val top = aggDec.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
    time("window top-k (count)")(top.count())
    time("full, noop write")(
      top.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
