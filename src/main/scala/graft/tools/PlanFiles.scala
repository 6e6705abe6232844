package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump per-query `.explain("formatted")` output to individual files
  * (plans/rNN/<query>_<tag>.txt) — the per-round before/after plan
  * evidence the optimization rounds commit alongside EXPLAIN.md.
  *
  * Usage: runMain graft.tools.PlanFiles <sfDir> <outDir> <tag> q_a,q_b
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanFiles <sfDir> <outDir> <tag> <q1,q2,...>")
    val d = args(0); val outDir = args(1); val tag = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
      println(s"[plans] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
