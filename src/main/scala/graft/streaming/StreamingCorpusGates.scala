package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.validation.Validation.CorpusGates

/** Continuous corpus-quality monitoring: the streaming twin of
  * Validation.validateCorpus, evaluating the ROW-LOCAL release gates
  * (null-text fraction, short-doc fraction, per-language coverage)
  * per event-time window over a live document ingest — the monitor a
  * crawl pipeline alarms on ("this hour's batch is 40% short docs")
  * long before a release-time batch validation would see it.
  *
  * Exact-duplicate monitoring is deliberately NOT here: dup fraction
  * is corpus-GLOBAL state, and its streaming surface already exists
  * as the incremental dedup ingest (StreamingNearDedup /
  * Dedup.dedupIncremental) — a windowed dup count would silently
  * miss every cross-window duplicate and report false health.
  *
  * Plan shape: ONE watermark-bounded streaming aggregation — every
  * gate signal is a conditional count over the fixed gate domain
  * (same single-aggregation discipline as StreamingDrift), followed
  * by a stateless projection computing fractions and pass booleans.
  * An alert sink is `filter(!window_pass)`.
  */
object StreamingCorpusGates {

  /** docs (streaming: textCol, langCol, tsCol) → one row per
    * event-time window: n_docs, per-gate observed fractions and pass
    * booleans (columns `null_frac`/`short_frac`/`cov_<lang>` with
    * `<gate>_pass`), plus `window_pass` = all gates green. Fractions
    * round to 6dp like the batch gate, so a window's decision is
    * engine- and partitioning-independent.
    */
  def gates(docs: DataFrame, textCol: String, langCol: String,
            tsCol: String, g: CorpusGates, watermarkDelay: String,
            windowLength: String): DataFrame = {
    val langs = g.minLangCoverage.toSeq.sortBy(_._1)
    val langAggs = langs.map { case (l, _) =>
      sum(when(col(langCol) === l, 1L).otherwise(0L)).as(s"c_$l")
    }
    val counts = docs
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength))
      .agg(count(lit(1)).as("n_docs"),
        (Seq(
          sum(when(col(textCol).isNull, 1L).otherwise(0L)).as("n_null"),
          // null text fails the < comparison into otherwise(0) — the
          // null gate owns it, same contract as the batch validator
          sum(when(size(split(col(textCol), " ")) < g.minWords, 1L)
            .otherwise(0L)).as("n_short")) ++ langAggs): _*)
    val nullFrac = round(col("n_null") / col("n_docs"), 6)
    val shortFrac = round(col("n_short") / col("n_docs"), 6)
    val covs = langs.map { case (l, min) =>
      (l, round(col(s"c_$l") / col("n_docs"), 6), min)
    }
    val langPass = covs.map { case (_, cov, min) => cov >= min }
      .foldLeft(lit(true))(_ && _)
    counts.select(
      (Seq(col("window"), col("n_docs"),
        nullFrac.as("null_frac"),
        (nullFrac <= g.maxNullTextFrac).as("null_pass"),
        shortFrac.as("short_frac"),
        (shortFrac <= g.maxShortFrac).as("short_pass")) ++
      covs.flatMap { case (l, cov, min) =>
        Seq(cov.as(s"cov_$l"), (cov >= min).as(s"cov_${l}_pass")) } :+
      (nullFrac <= g.maxNullTextFrac && shortFrac <= g.maxShortFrac &&
        langPass).as("window_pass")): _*)
  }
}
