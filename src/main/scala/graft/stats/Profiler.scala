package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-feature statistics profile — the reference's FeatureStatistics
  * row (reference src/main/java/.../domain/FeatureStatistics.java:
  * count, null_count, mean, stddev, min, max, p25/p50/p75/p95/p99).
  * Exact interpolated percentiles; single shuffle per profile pass.
  */
object Profiler {
  def profile(records: DataFrame, nameCol: String, valueCol: String)
  : DataFrame = {
    import graft.operators.WindowedFeatures.dsum
    val v = col(valueCol)
    records.groupBy(col(nameCol).as("feature_name"))
      .agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - count(v)).as("null_count"),
        round(dsum(v) / count(v), 6).as("mean"),
        round(stddev(v), 4).as("stddev"),
        min(v).as("min_value"),
        max(v).as("max_value"),
        round(percentile(v, lit(0.25)), 4).as("p25"),
        round(percentile(v, lit(0.5)), 4).as("p50"),
        round(percentile(v, lit(0.75)), 4).as("p75"),
        round(percentile(v, lit(0.95)), 4).as("p95"),
        round(percentile(v, lit(0.99)), 4).as("p99"))
  }

  /** Scale-path twin: approx_percentile (t-digest) instead of exact
    * interpolated percentiles. Exact percentile buffers every value
    * per group; the sketch is O(accuracy) per group regardless of
    * input size — the variant to run over 100 TB of records.
    */
  def profileApprox(records: DataFrame, nameCol: String, valueCol: String,
                    accuracy: Int = 10000): DataFrame = {
    import graft.operators.WindowedFeatures.dsum
    val v = col(valueCol)
    def pa(p: Double) = percentile_approx(v, lit(p), lit(accuracy))
    records.groupBy(col(nameCol).as("feature_name"))
      .agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - count(v)).as("null_count"),
        round(dsum(v) / count(v), 6).as("mean"),
        round(stddev(v), 4).as("stddev"),
        min(v).as("min_value"),
        max(v).as("max_value"),
        pa(0.25).as("p25"), pa(0.5).as("p50"), pa(0.75).as("p75"),
        pa(0.95).as("p95"), pa(0.99).as("p99"))
  }
}
