package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Stage-ISOLATED cost decomposition of the retrieval rankers
  * (round 15). RetrievalProbe timed stages cumulatively (later
  * counts re-ran earlier uncached stages), so its per-stage numbers
  * were not additive. Here every stage input is an eager
  * localCheckpoint, so each timed block measures ONLY its own
  * marginal work, and A/B variants (decimal vs long-micro
  * accumulation, window vs aggregate top-k) run over the SAME
  * checkpointed input.
  */
object RetrievalProbe2 {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[rprobe2] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
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

    val docs = Tables.documents(spark, d)
    val queries = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("q_id"),
        array_join(slice(split(col("text"), " "), 1, 8), " ").as("q_text"))

    // ---- stage 1: tokenize + tf aggregate --------------------------
    val tf0 = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    time("tf agg + eager checkpoint (1st)") { tf0.localCheckpoint(true) }
    val tf = time("tf agg + eager checkpoint (2nd)") { tf0.localCheckpoint(true) }
    println(s"[rprobe2] tf rows = ${tf.count()}")

    val qterms0 = queries
      .select(col("q_id"), explode(split(col("q_text"), " ")).as("term"))
      .filter(col("term") =!= "").distinct()
    val qterms = qterms0.localCheckpoint(true)
    println(s"[rprobe2] qterm rows = ${qterms.count()}")

    // ---- tfidf cosine stages (mirrors Search.tfidfCosineTopK) ------
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = tf.agg(count_distinct(col("doc_id")).as("n_docs"))
    val idfOf = (df: Column) => log((col("n_docs") + 1) / (df + 1)) + 1
    val dfq = dfreq.join(broadcast(qterms.select("term").distinct()), "term")

    val dnorm0 = tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .withColumn("w", col("tf") * idfOf(col("df")))
      .groupBy("doc_id")
      .agg(sqrt(sum(round(col("w") * col("w"), 6).cast("decimal(38,6)"))
        .cast("double")).as("dnorm"))
    val dnorm = time("dnorm agg (decimal) + ckpt") { dnorm0.localCheckpoint(true) }
    val dnormL0 = tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .withColumn("w", col("tf") * idfOf(col("df")))
      .withColumn("w2m", (round(col("w") * col("w"), 6) * 1e6 + 0.5).cast("long"))
      .groupBy("doc_id")
      .agg(sqrt((sum(col("w2m")).cast("double") / 1e6)).as("dnorm"))
    time("dnorm agg (long micros)") { noop(dnormL0) }

    val wD = tf
      .join(broadcast(dfq), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("w", col("tf") * idfOf(col("df")))
      .select("term", "doc_id", "w")
      .localCheckpoint(true)
    println(s"[rprobe2] wD rows = ${wD.count()}")
    val wQ = qterms.join(broadcast(dfq), Seq("term"), "left")
      .crossJoin(broadcast(nDocs))
      .withColumn("wq", idfOf(coalesce(col("df"), lit(0L))))
      .select("q_id", "term", "wq").localCheckpoint(true)

    // fan-out join alone (inputs checkpointed)
    val fanned0 = wD.join(dnorm, "doc_id").join(broadcast(wQ), "term")
    time("fan-out join (noop, no agg)") { noop(fanned0) }
    println(s"[rprobe2] fanned rows = ${fanned0.count()}")

    // A: current shape — per-fanned-row round + decimal cast + decimal sum
    val dotA = fanned0
      .withColumn("c", round(col("w") * col("wq"), 6).cast("decimal(38,6)"))
      .groupBy("q_id", "doc_id")
      .agg(sum("c").as("dot"), max("dnorm").as("dnorm"))
    time("dot agg A (round+decimal38)") { noop(dotA) }

    // B: per-fanned-row round, long-micro accumulate
    val dotB = fanned0
      .withColumn("cm", (round(col("w") * col("wq"), 6) * 1e6 + 0.5).cast("long"))
      .groupBy("q_id", "doc_id")
      .agg(sum("cm").as("dotm"), max("dnorm").as("dnorm"))
    time("dot agg B (round+long micros)") { noop(dotB) }

    // C: like B but skip the BigDecimal round entirely (NOT
    // semantics-preserving at half-ulp ties — A/B bound only)
    val dotC = fanned0
      .withColumn("cm", (col("w") * col("wq") * 1e6 + 0.5).cast("long"))
      .groupBy("q_id", "doc_id")
      .agg(sum("cm").as("dotm"), max("dnorm").as("dnorm"))
    time("dot agg C (raw long micros, bound)") { noop(dotC) }

    // D: hoist the round to the CHECKPOINTED sides: round(w*wq) is not
    // separable, so this variant pre-rounds w and wq to 6dp micros and
    // multiplies longs (different semantics — bound only)
    val qnorm = wQ.groupBy("q_id")
      .agg(sqrt(sum(round(col("wq") * col("wq"), 6).cast("decimal(38,6)"))
        .cast("double")).as("qnorm")).localCheckpoint(true)

    val scoredA = dotA.join(broadcast(qnorm), "q_id")
      .withColumn("score", round(
        col("dot").cast("double") / (col("dnorm") * col("qnorm")), 6))
      .localCheckpoint(true)
    println(s"[rprobe2] scored rows = ${scoredA.count()}")

    // ---- top-k variants over the same checkpointed scores ----------
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("doc_id"))
    val topWin = scoredA.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select("q_id", "doc_id", "rank", "score")
    time("top-k window (1st)") { noop(topWin) }
    time("top-k window (2nd)") { noop(topWin) }

    val topAgg = scoredA
      .select(col("q_id"), struct(negate(col("score")).as("ns"),
        col("doc_id").as("doc_id")).as("p"))
      .groupBy("q_id")
      .agg(slice(array_sort(collect_list(col("p"))), 1, 10).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("q_id"), col("p.doc_id").as("doc_id"),
        (col("i") + 1).cast("long").as("rank"),
        negate(col("p.ns")).as("score"))
    time("top-k sorted-array agg (1st)") { noop(topAgg) }
    time("top-k sorted-array agg (2nd)") { noop(topAgg) }

    // equality check window vs agg
    val diff = topWin.exceptAll(topAgg).count() +
      topAgg.exceptAll(topWin).count()
    println(s"[rprobe2] topk window-vs-agg diff rows = $diff")

    // ---- the full queries as shipped, for reference ----------------
    time("q_tfidf_cosine full (shipped)") {
      noop(graft.SparkEntry.qTfidfCosine(spark, d))
    }
    time("q_bm25 full (shipped)") {
      noop(graft.SparkEntry.qBm25(spark, d))
    }

    // ---- bm25 rank-stage A/B over checkpointed contrib stream ------
    val dlen = tf.groupBy("doc_id").agg(sum("tf").as("dlen"))
      .localCheckpoint(true)
    val stats = dlen.agg(count(lit(1)).as("n_docs"),
      sum("dlen").as("total_len"))
    val dfqB = dfreq.join(broadcast(qterms.select("term").distinct()), "term")
    val k1 = 1.2; val b = 0.75
    val avgdl = col("total_len").cast("double") / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfc = (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dlen") / avgdl))
    val contrib = tf.join(broadcast(dfqB), "term").join(dlen, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", round(idf * tfc, 6).cast("decimal(38,6)"))
      .withColumn("cmicro", (round(idf * tfc, 6) * 1e6 + 0.5).cast("long"))
      .select("term", "doc_id", "contrib", "cmicro")
      .localCheckpoint(true)
    println(s"[rprobe2] contrib rows = ${contrib.count()}")
    val fannedB = contrib.join(broadcast(qterms), "term")
    time("bm25 fan-out join alone (noop)") { noop(fannedB.select("q_id", "doc_id", "contrib")) }
    val aggDec = fannedB.groupBy("q_id", "doc_id")
      .agg(round(sum("contrib").cast("double"), 6).as("score"))
    time("bm25 agg decimal38 (1st)") { noop(aggDec) }
    time("bm25 agg decimal38 (2nd)") { noop(aggDec) }
    val aggLong = fannedB.groupBy("q_id", "doc_id")
      .agg(round(sum("cmicro").cast("double") / 1e6, 6).as("score"))
    time("bm25 agg long micros (1st)") { noop(aggLong) }
    time("bm25 agg long micros (2nd)") { noop(aggLong) }
    val diffB = aggDec.exceptAll(aggLong).count() +
      aggLong.exceptAll(aggDec).count()
    println(s"[rprobe2] bm25 decimal-vs-long diff rows = $diffB")

    spark.stop()
  }
}
