package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns

/** Round-16: is the single-row-group documents.parquet serializing
  * every text projection onto one core, and what does a conditional
  * repartition-after-read (guide §2.5) buy per representative stage?
  * Also A/Bs the Fns.bound let-binding fix for the lambda-capture
  * re-splits in Fns.shingles / topNgrams' gram build.
  */
object OptProbe16b {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[oprobe16b] $name%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
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
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val flat = Tables.load(spark, d, "documents")
    println(s"[oprobe16b] scan partitions = ${flat.rdd.getNumPartitions}")
    val wide = flat.repartition(cpus.toInt, col("doc_id"))

    def block(tag: String, docs: DataFrame): Unit = {
      time(s"$tag: shingle explode (Fns.shingles) noop") {
        noop(docs.select(col("source"),
          explode(Fns.shingles(col("text"), 3)).as("shingle"))) }
      time(s"$tag: tokenize+tf agg noop") {
        noop(docs.select(col("doc_id"),
            explode(Fns.words(col("text"))).as("term"))
          .filter(col("term") =!= "")
          .groupBy("doc_id", "term").agg(count(lit(1)))) }
      time(s"$tag: winnow fingerprints noop") {
        noop(graft.operators.TextAnalysis.winnow(docs, "doc_id", "text",
          k = 5, w = 4)) }
      time(s"$tag: gram-build (topNgrams shape) noop") {
        val ws = filter(Fns.words(col("text")), w => w =!= "")
        val idx = when(size(ws) >= 3, sequence(lit(1), size(ws) - 2))
          .otherwise(array())
        noop(docs.select(col("doc_id"),
          explode(transform(idx,
            i => array_join(slice(ws, i, lit(3)), " "))).as("ngram"))) }
    }
    // run twice per layout: first pass pays JIT, second is the number
    block("flat(1-split) cold", flat)
    block("flat(1-split) warm", flat)
    block("repart(32) warm", wide)
    block("repart(32) warm2", wide)

    // equality: repartition must not change any downstream VALUES
    val a = flat.select(col("source"),
      explode(Fns.shingles(col("text"), 3)).as("shingle"))
    val b = wide.select(col("source"),
      explode(Fns.shingles(col("text"), 3)).as("shingle"))
    println(s"[oprobe16b] shingle diff rows = ${
      a.exceptAll(b).count() + b.exceptAll(a).count()}")
    spark.stop()
  }
}
