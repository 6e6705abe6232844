package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous drift monitoring: the streaming analogue of
  * Profiler.psiDrift — live feature values binned with a STATIC
  * baseline histogram's geometry (the training-time profile), counted
  * per event-time window, and scored with PSI per (feature, window).
  *
  * Plan shape: the baseline is one small row per feature (bin
  * geometry + densified probability array) — broadcast, so the stream
  * never shuffles for it; the per-bin counts are conditional
  * aggregates over the FIXED bin domain, so the whole monitor is ONE
  * watermark-bounded streaming aggregation (no chained stateful
  * operators), followed by a stateless broadcast join + codegen'd
  * PSI fold. An alert sink is a plain `filter(psi > threshold)`.
  *
  * Re-expresses the reference's drift-monitoring intent (reference
  * src/main/java/.../domain/FeatureStatistics.java histogram_bins +
  * ValidationService distribution checks) as a continuous query.
  */
object StreamingDrift {

  /** Collapse a batch histogram (Profiler.histogram output) into one
    * broadcastable row per feature: bin geometry (vmin, width) and the
    * DENSIFIED smoothed baseline probability array (missing bins get
    * the smoothed-zero mass), indexable by bin id.
    */
  def baselineFromHistogram(hist: DataFrame, nBins: Int): DataFrame =
    hist.groupBy("feature_name")
      .agg(
        map_from_entries(collect_list(struct(col("bin"), col("n")))).as("m"),
        sum(col("n")).as("total"),
        min(col("bin_lo")).as("vmin"),
        ((max(col("bin_hi")) - min(col("bin_lo"))) / nBins).as("width"))
      .select(col("feature_name"), col("vmin"), col("width"),
        transform(sequence(lit(0L), lit(nBins - 1L)),
          b => (coalesce(element_at(col("m"), b), lit(0L)) + 0.5) /
               (col("total") + 0.5 * nBins)).as("p_base"))

  /** events (streaming: feature_name, value, event_time) → one row per
    * (feature, event-time window) with the live count and PSI vs the
    * baseline. PSI here sums over the full fixed bin domain with
    * additive smoothing on both sides, so empty live bins are finite.
    */
  def psi(events: DataFrame, baseline: DataFrame, nBins: Int,
          watermarkDelay: String, windowLength: String): DataFrame = {
    val binned = events
      .withWatermark("event_time", watermarkDelay)
      .join(broadcast(baseline), Seq("feature_name"))
      .withColumn("bin",
        when(col("width") === 0.0, lit(0L))
          .otherwise(least(greatest(
            floor((col("value") - col("vmin")) / col("width")), lit(0L)),
            lit(nBins - 1).cast("long"))).cast("long"))
    // ONE streaming aggregation: per-bin conditional counts over the
    // fixed bin domain (p_base rides along via first()).
    val binCounts = (0 until nBins).map(b =>
      sum(when(col("bin") === b, 1L).otherwise(0L)).as(s"c_$b"))
    val counts = binned
      .groupBy(col("feature_name"), window(col("event_time"), windowLength))
      .agg(binCounts.head, (binCounts.tail :+ first(col("p_base"))
        .as("p_base")): _*)
    val nWindow = (0 until nBins).map(b => col(s"c_$b"))
      .reduce(_ + _)
    def pLive(b: Int): Column =
      (col(s"c_$b") + 0.5) / (col("n_window") + 0.5 * nBins)
    val terms = (0 until nBins).map { b =>
      val pb = element_at(col("p_base"), b + 1)
      (pLive(b) - pb) * log(pLive(b) / pb)
    }
    counts
      .withColumn("n_window", nWindow)
      .withColumn("psi", round(terms.reduce(_ + _), 6))
      .select("feature_name", "window", "n_window", "psi")
  }
}
