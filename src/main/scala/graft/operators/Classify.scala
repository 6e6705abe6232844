package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Model-based quality filtering: train a multinomial Naive Bayes
  * text classifier on a small LABELED seed set, then score the whole
  * corpus — the fastText-classifier shape modern pretraining
  * pipelines use (DCLM, FineWeb-Edu: a cheap trusted annotator
  * labels thousands of documents, the learned model filters
  * billions). The reference has no model-based filter; this is the
  * engine's supervised complement to the rule-based
  * [[TextAnalysis.qualityClassifier]] — rules are the annotator,
  * the NB model generalizes them to one vocabulary-join pass.
  *
  * Training IS aggregation (per-word class counts + class priors),
  * so unlike gradient-trained models the whole fit is declarative,
  * deterministic, and SQL-replayable — the reason NB is the
  * classifier an exact correctness gate can hold end-to-end.
  *
  * Scale shape: the seed pass shuffles only seed-sized data; the
  * model (per-word log-likelihood ratios) is SEED-VOCABULARY-sized
  * and broadcast, so corpus scoring is explode → broadcast join →
  * one groupBy(doc_id) with map-side combine. The corpus never
  * shuffles tokens by word.
  *
  * Determinism: per-word log ratios are rounded to 6 dp and summed
  * exactly as integer micros (the [[Dsir]] convention — the 6dp
  * decimal model values convert to exact longs on the vocabulary-
  * sized table, so the corpus aggregate is a codegen long add) —
  * add-order independent, bit-equal to the DuckDB oracle.
  */
object Classify {

  /** Per-word 6dp log-likelihood-ratio model plus the OOV and prior
    * constants, all exact DECIMAL(20,6) — computed from the seed's
    * class-conditional word counts with add-`alpha` smoothing over
    * the seed vocabulary (unseen words get the smoothed-only ratio,
    * the principled multinomial treatment rather than dropping OOV).
    */
  private def model(seedTokens: DataFrame, seed: DataFrame,
                    labelCol: String, alpha: Double)
  : (DataFrame, DataFrame) = {
    val a = lit(alpha)
    // Feeds BOTH the totals aggregate and the ratio projection —
    // checkpoint so the seed corpus is tokenized once (lm_score's
    // duplicated-subtree lesson).
    val counts = seedTokens
      .groupBy("w")
      .agg(sum(when(col("lbl"), 1L).otherwise(0L)).as("c_pos"),
           sum(when(col("lbl"), 0L).otherwise(1L)).as("c_neg"))
      .localCheckpoint(false)
    val totals = counts.agg(sum("c_pos").as("tot_pos"),
      sum("c_neg").as("tot_neg"), count(lit(1)).as("v"))
    val priors = seed.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("n_neg"))
    val stats = totals.crossJoin(priors)
      .select(col("tot_pos"), col("tot_neg"), col("v"),
        round(log(a / (col("tot_pos") + a * col("v"))) -
              log(a / (col("tot_neg") + a * col("v"))), 6)
          .cast("decimal(20,6)").as("oov_lr"),
        round(log(col("n_pos") * lit(1.0) / col("n_neg")), 6)
          .cast("decimal(20,6)").as("prior_lr"))
    val llr = counts.crossJoin(broadcast(stats))
      .select(col("w"),
        round(log((col("c_pos") + a) / (col("tot_pos") + a * col("v"))) -
              log((col("c_neg") + a) / (col("tot_neg") + a * col("v"))), 6)
          .cast("decimal(20,6)").as("lr"))
    (llr, stats.select("oov_lr", "prior_lr"))
  }

  /** Train on `seed` (a small (id, boolean label) frame — its text
    * comes from `docs` by id join) and score EVERY document:
    * `log_odds` = prior + Σ per-token smoothed log ratio, `keep` =
    * log_odds >= `threshold`. Documents with NULL text carry no
    * tokens and are dropped (the lm_score convention); seed rows
    * must contain both classes (a one-class seed has no likelihood
    * ratio to learn — the priors/ratios go NULL, not wrong).
    */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
              seed: DataFrame, seedIdCol: String, seedLabelCol: String,
              alpha: Double = 1.0, threshold: Double = 0.0): DataFrame = {
    // 9.2e12 = Long.MaxValue / 1e6 rounded down: the threshold is
    // compared in long MICROS, and a wider value would overflow the
    // decimal→long cast to NULL (making `keep` silently NULL-valued)
    // instead of failing loudly here
    require(math.abs(threshold) <= 9.2e12,
      s"threshold must fit the long-micros scale (|t| <= 9.2e12), " +
        s"got $threshold")
    val seedKeyed = seed.select(col(seedIdCol).as("doc_id"),
      col(seedLabelCol).as("lbl"))
    val seedTokens = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .join(broadcast(seedKeyed), "doc_id")
      .select(col("lbl"), explode(Fns.words(col("text"))).as("w"))
    val (llr, konst) = model(seedTokens, seedKeyed, "lbl", alpha)
    // Score accumulation in exact integer MICROS (the Dsir
    // importanceWeights / scoreFrozen shape): the 6dp-exact decimal
    // ratios convert to exact longs ONCE on the vocabulary-sized
    // model table, the corpus-token-stream aggregate then updates a
    // codegen long instead of a precision-20 BigDecimal per token,
    // and the long→double/1e6 conversion plus the micro-vs-micro
    // threshold compare are value-identical to the decimal forms
    // (micro sums stay far under 2^53: |log_odds| ≤ 9e9).
    val llrm = llr.withColumn("lrm",
      (col("lr") * lit(1000000L)).cast("long")).drop("lr")
    val konstm = konst.select(
      (col("oov_lr") * lit(1000000L)).cast("long").as("oov_lrm"),
      (col("prior_lr") * lit(1000000L)).cast("long").as("prior_lrm"))
    docs.select(col(idCol).as("doc_id"),
        explode(Fns.words(col(textCol))).as("w"))
      .join(broadcast(llrm), Seq("w"), "left")
      .crossJoin(broadcast(konstm))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (max(col("prior_lrm")) +
          sum(coalesce(col("lrm"), col("oov_lrm")))).as("lom"))
      .select(col("doc_id"), col("n_tokens"),
        (col("lom").cast("double") / 1e6).as("log_odds"),
        (col("lom") >= (lit(threshold).cast("decimal(20,6)") *
          lit(1000000L)).cast("long")).as("keep"))
  }

  /** CALIBRATION REPORT for a classifier's scores against observed
    * labels — the reliability-diagram table (is a high-scoring decile
    * actually mostly positive?): rank-binned, so bin edges are
    * integer-exact and partition-independent (`bin = below·nBins DIV
    * (total-1)`, where `below` is the count of strictly-smaller
    * scores from the same distributed prefix sum q_ppl_buckets uses —
    * no global sort, no float bin-edge rounding, ties share a bin by
    * construction). Per bin: volume, positives, positive rate (6 dp),
    * and the exact score range. A model whose pos_rate is monotone in
    * bin is well-ORDERED; one whose pos_rate tracks the bin's
    * sigmoid-mean is well-CALIBRATED — this report is the evidence
    * either way, and the standard gate before a learned quality
    * filter's threshold is trusted at corpus scale. */
  def calibrationReport(scored: DataFrame, scoreCol: String,
                        labelCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val s = scored.select(col(scoreCol).as("score"),
        col(labelCol).cast("boolean").as("lbl"))
      .filter(col("score").isNotNull && col("lbl").isNotNull)
      .localCheckpoint(false) // feeds the rank table AND the join
    val counts = s.groupBy("score").agg(count(lit(1)).as("cnt"))
    val rt = graft.operators.FeatureEng.runningTotal(counts, "score", "cnt")
    val total = s.count()
    val below = rt.select(col("ord").as("score"),
      (col("running_total") - col("val")).as("below"))
    s.join(below, "score")
      .withColumn("bin",
        if (total > 1)
          expr(s"least(below * $nBins DIV ${total - 1}, ${nBins - 1})")
        else lit(0L))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lbl"), 1L).otherwise(0L)).as("n_pos"),
        round(sum(when(col("lbl"), 1L).otherwise(0L)) /
          count(lit(1)).cast("double"), 6).as("pos_rate"),
        min("score").as("score_min"),
        max("score").as("score_max"))
  }
}
