package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns
import graft.operators.Dedup

/** Ad-hoc stage timing for the hot dedup queries. */
object Diag {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[diag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, d)
    time("docs count")(docs.count())
    val sh = docs.select(col("doc_id"),
      explode(graft.functions.ShingleHash.shingles(col("text"), 3)).as("s"))
    time("shingle explode")(sh.count())
    val cached = sh.persist()
    time("shingle cached")(cached.count())
    val joined = cached.as("a").join(cached.as("b"),
      col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
    time("index self-join")(joined.count())
    time("pair groupBy")(
      joined.groupBy(col("a.doc_id"), col("b.doc_id")).count().count())
    cached.unpersist()
    time("full ngramJaccard")(
      Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.8).count())
    time("full simhashPairs")(
      Dedup.simhashPairs(docs, "doc_id", "text", 6).count())
    time("simhash signatures")(
      Dedup.simhashSignatures(docs, "doc_id", "text").count())
    time("full minhashLsh")(
      Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4).count())
    spark.stop()
  }
}
