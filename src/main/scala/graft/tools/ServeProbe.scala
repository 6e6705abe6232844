package graft.tools

import org.apache.spark.sql.SparkSession

/** Targeted same-session A/B timing for a handful of SparkEntry
  * queries — the cheap instrument for "did this query family really
  * regress, or is it box state?" (full Bench costs ~4 min/pass; this
  * runs just the rows in question). Same methodology as Bench: one
  * warm-up execution, then two measured noop-write passes; per the
  * standing rule only deltas that reproduce across BOTH passes and
  * exceed 2x merit investigation.
  *
  * Default target: the four artifact-backed retrieval rows
  * (serve/bulk/rrf/metrics) flagged in round 8 as ~4s vs round 7's
  * ~2.5s across sessions — stable within each session, so suspected
  * box state; this probe is the confirming instrument.
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq(
      "q_bm25_serve", "q_bm25_bulk", "q_hybrid_rrf",
      "q_retrieval_metrics"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, d)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      once(n) // warm-up: parquet decode + codegen JIT + artifact build
      val p1 = once(n)
      val p2 = once(n)
      println(f"[serve] $n%-24s pass1=$p1%6.2f s  pass2=$p2%6.2f s")
    }
    spark.stop()
  }
}
