package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.operators.{Dedup, Sketch}

/** Round-15 optimization probes: stage splits for the non-retrieval
  * hot rows (q_join_plan, q_distinct_hll, q_slice_overlap,
  * q_dedup_clusters) plus A/B variants that keep results identical.
  */
object OptProbe15 {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[oprobe] $name%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "all"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    if (which == "all" || which == "joinplan") {
      // ---- q_join_plan: shipped vs sketch-checkpointed ------------
      time("q_join_plan shipped (1st)") { noop(SparkEntry.qJoinPlan(spark, d)) }
      time("q_join_plan shipped (2nd)") { noop(SparkEntry.qJoinPlan(spark, d)) }

      def scenCk(name: String, a: DataFrame, b: DataFrame): DataFrame = {
        val skA = Sketch.cmSketchRows(a, "k", depth = 3, width = 1024)
          .localCheckpoint(false)
        val skB = Sketch.cmSketchRows(b, "k", depth = 3, width = 1024)
          .localCheckpoint(false)
        Sketch.cmJoinPlan(skA, skB, broadcastRows = 5000L, skewFactor = 8L)
          .crossJoin(a.join(b, Seq("k"))
            .agg(count(lit(1)).as("exact_join_size")))
          .select(lit(name).as("scenario"), col("n_a"), col("n_b"),
            col("distinct_a_lb"), col("distinct_b_lb"),
            col("hot_a"), col("hot_b"), col("join_size_est"),
            col("exact_join_size"), col("strategy"))
      }
      def jp2(): DataFrame = {
        val lkHot = Tables.lineitem(spark, d).select(
          when(col("l_linenumber") === 1, lit("hot"))
            .otherwise(col("l_orderkey").cast("string")).as("k"))
        scenCk("nation_region",
            Tables.nation(spark, d).select(col("n_regionkey").cast("string").as("k")),
            Tables.region(spark, d).select(col("r_regionkey").cast("string").as("k")))
          .unionByName(scenCk("nation_customer",
            Tables.nation(spark, d).select(col("n_nationkey").cast("string").as("k")),
            Tables.customer(spark, d).select(col("c_nationkey").cast("string").as("k"))))
          .unionByName(scenCk("orders_lineitem",
            Tables.orders(spark, d).select(col("o_orderkey").cast("string").as("k")),
            Tables.lineitem(spark, d).select(col("l_orderkey").cast("string").as("k"))))
          .unionByName(scenCk("orders_lineitem_hotkey",
            Tables.orders(spark, d).select(col("o_orderkey").cast("string").as("k")),
            lkHot))
      }
      time("q_join_plan ckpt sketches (1st)") { noop(jp2()) }
      time("q_join_plan ckpt sketches (2nd)") { noop(jp2()) }
      val diff = SparkEntry.qJoinPlan(spark, d).exceptAll(jp2()).count() +
        jp2().exceptAll(SparkEntry.qJoinPlan(spark, d)).count()
      println(s"[oprobe] join_plan shipped-vs-ckpt diff rows = $diff")
    }

    if (which == "all" || which == "hll") {
      // ---- q_distinct_hll: shipped vs shared-distinct -------------
      time("q_distinct_hll shipped (1st)") { noop(SparkEntry.qDistinctHll(spark, d)) }
      time("q_distinct_hll shipped (2nd)") { noop(SparkEntry.qDistinctHll(spark, d)) }
      // shared-distinct variant
      def h32(key: org.apache.spark.sql.Column, off: Int) =
        conv(substring(md5(key), off, 8), 16, 10).cast("long")
      def hllShared(): DataFrame = {
        val p = 8; val m = 1 << p
        val sh = Tables.documents(spark, d).select(col("source"),
          explode(graft.functions.Fns.shingles(col("text"), 3)).as("shingle"))
        val keyed = sh.filter(col("shingle").isNotNull)
          .select(col("source"), col("shingle").as("k")).distinct()
          .localCheckpoint(false)
        val regs = keyed
          .select(col("source"), (h32(col("k"), 1) % m).as("reg_idx"),
            (lit(33) - length(ltrim(bin(h32(col("k"), 9)), "0"))).as("rho"))
          .groupBy(col("source"), col("reg_idx"))
          .agg(max("rho").as("mj"))
        val est = regs.groupBy(col("source"))
          .agg(count(lit(1)).as("n_regs"),
            sum(pow(lit(2.0), -col("mj"))).as("sum_present"))
          .withColumn("zeros", lit(m) - col("n_regs"))
          .withColumn("raw_e",
            lit(graft.functions.HllSketch.alpha(m)) * lit(m.toDouble) * lit(m.toDouble) /
              (col("sum_present") + col("zeros").cast("double")))
          .withColumn("hll_estimate",
            round(when(col("raw_e") <= lit(2.5 * m) && col("zeros") > 0,
              lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
              .otherwise(col("raw_e")), 4))
        val exact = keyed.groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
        est.join(exact, Seq("source"))
          .select(col("source"), col("n_exact"), col("hll_estimate"),
            round((col("hll_estimate") - col("n_exact")) / col("n_exact"), 4)
              .as("rel_err"))
      }
      time("q_distinct_hll shared-distinct (1st)") { noop(hllShared()) }
      time("q_distinct_hll shared-distinct (2nd)") { noop(hllShared()) }
      val diffH = SparkEntry.qDistinctHll(spark, d).exceptAll(hllShared()).count() +
        hllShared().exceptAll(SparkEntry.qDistinctHll(spark, d)).count()
      println(s"[oprobe] hll shipped-vs-shared diff rows = $diffH")
    }

    if (which == "all" || which == "kmv") {
      // ---- q_slice_overlap stage split ------------------------------
      time("q_slice_overlap shipped (1st)") { noop(SparkEntry.qSliceOverlap(spark, d)) }
      time("q_slice_overlap shipped (2nd)") { noop(SparkEntry.qSliceOverlap(spark, d)) }
      val sh = Tables.documents(spark, d).select(col("source"),
        explode(graft.functions.Fns.shingles(col("text"), 3)).as("shingle"))
      val keys = sh.filter(col("shingle").isNotNull)
        .select(col("source").as("slice"), md5(col("shingle")).as("h")).distinct()
      val keysCk = time("kmv keys distinct (eager ckpt)") { keys.localCheckpoint(true) }
      println(s"[oprobe] kmv distinct rows = ${keysCk.count()}")
      import org.apache.spark.sql.expressions.Window
      val sk = keysCk.withColumn("rn", row_number().over(
          Window.partitionBy("slice").orderBy("h")))
        .filter(col("rn") <= 64).select("slice", "h")
      time("kmv bottom-k window") { noop(sk) }
      val exactJ = keysCk.as("x").join(keysCk.as("y"),
          col("x.h") === col("y.h") && col("x.slice") < col("y.slice"))
        .groupBy(col("x.slice").as("slice_a"), col("y.slice").as("slice_b"))
        .agg(count(lit(1)).as("n_inter"))
      time("kmv exact self-join agg (1st)") { noop(exactJ) }
      time("kmv exact self-join agg (2nd)") { noop(exactJ) }
      // in-row pair generation variant
      val exactP = keysCk.groupBy("h").agg(sort_array(collect_set("slice")).as("ss"))
        .filter(size(col("ss")) >= 2)
        .select(explode(flatten(transform(col("ss"), (a, i) =>
          transform(slice(col("ss"), i + 2, size(col("ss"))), b =>
            struct(a.as("slice_a"), b.as("slice_b")))))).as("p"))
        .groupBy(col("p.slice_a").as("slice_a"), col("p.slice_b").as("slice_b"))
        .agg(count(lit(1)).as("n_inter"))
      time("kmv exact collect_set pairs (1st)") { noop(exactP) }
      time("kmv exact collect_set pairs (2nd)") { noop(exactP) }
      val diffK = exactJ.exceptAll(exactP).count() + exactP.exceptAll(exactJ).count()
      println(s"[oprobe] kmv exact join-vs-collect diff rows = $diffK")
    }

    if (which == "all" || which == "clusters") {
      // ---- q_dedup_clusters: pair gen vs label loop -----------------
      val pairs = Dedup.ngramJaccard(Tables.documents(spark, d), "doc_id",
        "text", n = 3, threshold = 0.8, maxDf = 100)
      time("ngramJaccard pairs (noop)") { noop(pairs) }
      val pairsCk = pairs.localCheckpoint(true)
      println(s"[oprobe] pair rows = ${pairsCk.count()}")
      time("clusters loop over ckpt pairs") { noop(Dedup.clusters(pairsCk)) }
      time("q_dedup_clusters full shipped") { noop(SparkEntry.qDedupClusters(spark, d)) }
    }

    spark.stop()
  }
}
