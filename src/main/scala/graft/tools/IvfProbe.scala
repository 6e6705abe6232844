package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway-style diagnostic for the q_ann_ivf bench regression:
  * times repeated runs the way Bench does (fresh Tables plan per
  * call) and reports whether the quantizer cache hit. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(tag: String): Unit = {
      val t0 = System.nanoTime()
      graft.SparkEntry.qAnnIvf(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ivfprobe] $tag%-8s ${dt}%.3fs trainings=${graft.operators.Ann.quantizerTrainings.get()}")
    }
    once("warm"); once("measured"); once("third"); once("fourth")
    spark.stop()
  }
}
