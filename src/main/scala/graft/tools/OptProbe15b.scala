package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.operators.{Bpe, Dedup, FeatureEng, TextAnalysis, Unigram}

/** Round-15 probes, part 2: pretrain capstones and the 2-3 s band
  * (phrase search, winnow pairs, top-ngrams, strip spans, frozen
  * quality filter, doremi mix, unigram sample, trust select).
  * Stage inputs are eagerly checkpointed so timings are marginal.
  */
object OptProbe15b {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[oprobeb] $name%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
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
    val docs = Tables.documents(spark, d)

    if (which == "all" || which == "pretrain") {
      time("q_pretrain_pipeline (1st)") { noop(SparkEntry.qPretrainPipeline(spark, d)) }
      time("q_pretrain_pipeline (2nd)") { noop(SparkEntry.qPretrainPipeline(spark, d)) }
      val winners = SparkEntry.qPretrainPipeline(spark, d).select("doc_id")
        .localCheckpoint(true)
      println(s"[oprobeb] winner rows = ${winners.count()}")
      val wc0 = Bpe.corpusWordCounts(docs, "doc_id", "text")
      time("corpusWordCounts (agg+collect-free)") { noop(wc0) }
      val wc = wc0.localCheckpoint(true)
      val costs = time("seedVocab+integerCosts+collectCosts") {
        Unigram.collectCosts(
          Unigram.integerCosts(Unigram.seedVocab(wc, maxPieceLen = 4,
            topK = 64)))
      }
      val sel = docs.join(winners, Seq("doc_id"), "left_semi")
        .localCheckpoint(true)
      println(s"[oprobeb] sel rows = ${sel.count()}")
      val enc0 = Unigram.encodeDocs(sel, "doc_id", "text", costs,
        maxPieceLen = 4)
      time("encodeDocs over winners (noop)") { noop(enc0) }
      val enc = enc0.localCheckpoint(true)
      time("packValues window") {
        noop(FeatureEng.packValues(enc, "doc_id", "n_tokens",
          budgetTokens = 512L))
      }
      time("q_pretrain_tokenize full (1st)") { noop(SparkEntry.qPretrainTokenize(spark, d)) }
      time("q_pretrain_tokenize full (2nd)") { noop(SparkEntry.qPretrainTokenize(spark, d)) }
      time("q_pretrain_masks full") { noop(SparkEntry.qPretrainMasks(spark, d)) }
      time("q_pretrain_mix full (1st)") { noop(SparkEntry.qPretrainMix(spark, d)) }
      time("q_pretrain_mix full (2nd)") { noop(SparkEntry.qPretrainMix(spark, d)) }
    }

    if (which == "all" || which == "band23") {
      // warm each, then measure the warm pass
      for (q <- Seq("q_phrase_search", "q_winnow_pairs", "q_top_ngrams",
          "q_strip_spans", "q_quality_filter_frozen", "q_doremi_mix",
          "q_unigram_sample", "q_trust_select", "q_bpe_merges")) {
        val fn = SparkEntry.queries(q)
        time(s"$q (1st)") { noop(fn(spark, d)) }
        time(s"$q (2nd)") { noop(fn(spark, d)) }
      }
    }

    if (which == "all" || which == "phrase") {
      // phrase search stage split
      val queries = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("q_id"),
          array_join(slice(split(col("text"), " "), 3, 4), " ").as("phrase"))
      val tokens = docs.select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
        .filter(col("term") =!= "")
      time("phrase: tokens posexplode (noop)") { noop(tokens) }
      val tokCk = tokens.localCheckpoint(true)
      val qtok = queries.select(col("q_id"),
          posexplode(split(col("phrase"), " ")).as(Seq("off", "term")))
        .filter(col("term") =!= "").localCheckpoint(true)
      val qlen = qtok.groupBy("q_id").agg(count(lit(1)).as("qlen"))
        .localCheckpoint(true)
      val fanned = tokCk.join(broadcast(qtok), "term")
        .withColumn("diag", col("pos") - col("off"))
        .filter(col("diag") >= 0)
      time("phrase: fan-out join (noop)") { noop(fanned) }
      println(s"[oprobeb] phrase fanned rows = ${fanned.count()}")
      val hits = fanned.groupBy("q_id", "doc_id", "diag")
        .agg(count(lit(1)).as("hits"))
      time("phrase: diag agg") { noop(hits) }
      val out = hits.join(broadcast(qlen), "q_id")
        .filter(col("hits") === col("qlen"))
        .groupBy("q_id", "doc_id")
        .agg(count(lit(1)).as("n_occurrences"),
          min("diag").cast("long").as("first_pos"))
      time("phrase: tail") { noop(out) }
      time("phrase: shipped two-agg chain (warm)") {
        noop(fanned.groupBy("q_id", "doc_id", "diag")
          .agg(count(lit(1)).as("hits"))
          .join(broadcast(qlen), "q_id")
          .filter(col("hits") === col("qlen"))
          .groupBy("q_id", "doc_id")
          .agg(count(lit(1)).as("n_occurrences"),
            min("diag").cast("long").as("first_pos")))
      }
      // single-shuffle variant: one groupBy (q_id, doc_id), in-row
      // multiplicity count over the sorted diag list
      def onePass(): DataFrame = {
        val diags = fanned.groupBy("q_id", "doc_id")
          .agg(sort_array(collect_list(col("diag"))).as("ds"))
          .join(broadcast(qlen), "q_id")
        // runs of equal diag with length == qlen are occurrences.
        // multiplicity <= qlen by construction, so a run starting at
        // 0-based i has length qlen iff ds[i] == ds[i+qlen-1] (O(n)).
        diags
          .withColumn("occ", filter(
            transform(col("ds"), (v, i) =>
              when((i === 0 || element_at(col("ds"), i) =!= v) &&
                i + col("qlen") <= size(col("ds")) &&
                element_at(col("ds"), (i + col("qlen")).cast("int")) === v,
                v)),
            v => v.isNotNull))
          .filter(size(col("occ")) > 0)
          .select(col("q_id"), col("doc_id"),
            size(col("occ")).cast("long").as("n_occurrences"),
            element_at(col("occ"), 1).cast("long").as("first_pos"))
      }
      time("phrase: one-shuffle variant (1st)") { noop(onePass()) }
      time("phrase: one-shuffle variant (2nd)") { noop(onePass()) }
      val d1 = out.exceptAll(onePass()).count() + onePass().exceptAll(out).count()
      println(s"[oprobeb] phrase shipped-vs-onepass diff rows = $d1")
    }

    if (which == "all" || which == "frozen") {
      val base = docs.select(col("doc_id"),
          split(col("text"), " ").as("ws"))
        .withColumn("bg", when(size(col("ws")) >= 2,
          expr("transform(sequence(0, size(ws) - 2), " +
            "i -> concat_ws(' ', ws[i], ws[i + 1]))"))
          .otherwise(array().cast("array<string>")))
        .localCheckpoint(true)
      println(s"[oprobeb] frozen base rows = ${base.count()}")
      val quadW = expr("array_max(transform(array_distinct(ws), " +
        "w -> size(filter(ws, x -> x = w))))")
      val quadB = expr("array_max(transform(array_distinct(bg), " +
        "b -> size(filter(bg, x -> x = b))))")
      def runMax(arr: String) =
        expr(s"aggregate(array_sort($arr), " +
          "named_struct('prev', cast(null as string), 'run', 0, 'mx', 0), " +
          "(s, x) -> named_struct('prev', x, " +
          "'run', IF(x <=> s.prev, s.run + 1, 1), " +
          "'mx', greatest(s.mx, IF(x <=> s.prev, s.run + 1, 1))), " +
          "s -> IF(s.mx = 0, cast(null as int), s.mx))")
      val qa = base.select(col("doc_id"), quadW.as("mw"), quadB.as("mb"))
      val qb = base.select(col("doc_id"), runMax("ws").as("mw"),
        runMax("bg").as("mb"))
      time("freq: quadratic filter-count (1st)") { noop(qa) }
      time("freq: quadratic filter-count (2nd)") { noop(qa) }
      time("freq: sorted run-length (1st)") { noop(qb) }
      time("freq: sorted run-length (2nd)") { noop(qb) }
      val dq = qa.exceptAll(qb).count() + qb.exceptAll(qa).count()
      println(s"[oprobeb] frozen quad-vs-runlen diff rows = $dq")
      time("q_quality_filter_frozen shipped (warm)") {
        noop(SparkEntry.queries("q_quality_filter_frozen")(spark, d))
      }
    }

    if (which == "all" || which == "micro") {
      // guarded fast 6dp micro rounding vs round(x,6) on the fanned
      // cosine stream: floor(x*1e6+0.5) except within 1e-3 of the
      // half-micro boundary, where BigDecimal HALF_UP still decides.
      val tf = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
      val queries = docs.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("q_id"),
          array_join(slice(split(col("text"), " "), 1, 8), " ").as("q_text"))
      val qterms = queries.select(col("q_id"),
          explode(split(col("q_text"), " ")).as("term"))
        .filter(col("term") =!= "").distinct().localCheckpoint(true)
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nDocs = tf.agg(count_distinct(col("doc_id")).as("n_docs"))
      val idfOf = (c: org.apache.spark.sql.Column) =>
        log((col("n_docs") + 1) / (c + 1)) + 1
      val dfq = dfreq.join(broadcast(qterms.select("term").distinct()), "term")
      val wD = tf.join(broadcast(dfq), "term").crossJoin(broadcast(nDocs))
        .withColumn("w", col("tf") * idfOf(col("df")))
        .select("term", "doc_id", "w").localCheckpoint(true)
      val wQ = qterms.join(broadcast(dfq), Seq("term"), "left")
        .crossJoin(broadcast(nDocs))
        .withColumn("wq", idfOf(coalesce(col("df"), lit(0L))))
        .select("q_id", "term", "wq").localCheckpoint(true)
      val fanned = wD.join(broadcast(wQ), "term").localCheckpoint(true)
      println(s"[oprobeb] micro fanned rows = ${fanned.count()}")
      val x = col("w") * col("wq")
      val slow = fanned
        .withColumn("cm", (round(x, 6) * 1e6 + 0.5).cast("long"))
        .groupBy("q_id", "doc_id").agg(sum("cm").as("dot"))
      val scaled = x * 1e6
      val guarded = when(abs(scaled - floor(scaled) - 0.5) < 1e-3,
        (round(x, 6) * 1e6 + 0.5).cast("long"))
        .otherwise(floor(scaled + 0.5))
      val fast = fanned
        .withColumn("cm", guarded)
        .groupBy("q_id", "doc_id").agg(sum("cm").as("dot"))
      time("micro: round-always (1st)") { noop(slow) }
      time("micro: round-always (2nd)") { noop(slow) }
      time("micro: guarded floor (1st)") { noop(fast) }
      time("micro: guarded floor (2nd)") { noop(fast) }
      val dm = slow.exceptAll(fast).count() + fast.exceptAll(slow).count()
      println(s"[oprobeb] micro slow-vs-guarded diff rows = $dm")
      val nGuard = fanned.filter(abs(scaled - floor(scaled) - 0.5) < 1e-3)
        .count()
      println(s"[oprobeb] micro guard-band rows = $nGuard")
    }

    spark.stop()
  }
}
