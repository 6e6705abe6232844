package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-horizon windowed per-entity feature aggregates — the Spark
  * re-expression of the reference's gmv_30d / txn_count_30d /
  * active_days_30d / *_velocity_pct feature families
  * (reference python/gbdt_example/dataset.py:24-41).
  *
  * Scale design: ALL horizons are computed in a single groupBy over the
  * entity key using conditional aggregation — one shuffle regardless of
  * the number of horizons, with map-side partial aggregation. At 100 TB
  * the scan prunes on the event_time partition column first (longest
  * horizon), so shorter horizons are free.
  */
object WindowedFeatures {

  /** Exact money-sum: accumulate 2-decimal doubles as DECIMAL(18,2) so
    * the result is independent of partition/accumulation order, then
    * surface as double. Deterministic across engines and cluster sizes.
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Per-entity aggregates over a single [start, end) window:
    * event count, exact sum, mean (6dp), active days, per-type counts.
    */
  def windowed(events: DataFrame, entity: String, ts: String, value: String,
               typeCol: String, start: String, end: String): DataFrame = {
    val in = events.filter(col(ts) >= lit(start).cast("timestamp") &&
                           col(ts) < lit(end).cast("timestamp"))
    in.groupBy(col(entity).as("entity_id"))
      .agg(
        count(lit(1)).as("txn_count"),
        coalesce(dsum(col(value)), lit(0.0)).as("total_value"),
        round(dsum(col(value)) / count(lit(1)), 6).as("avg_value"),
        countDistinct(to_date(col(ts))).as("active_days"),
        count(when(col(typeCol) === "purchase", 1)).as("purchase_count"),
        count(when(col(typeCol) === "click", 1)).as("click_count"))
  }

  /** All horizons in one shuffle: for each (label, start) horizon ending
    * at `end`, emit txn_count_<label> and total_value_<label>.
    */
  def multiWindow(events: DataFrame, entity: String, ts: String,
                  value: String, end: String,
                  horizons: Seq[(String, String)]): DataFrame = {
    val endTs = lit(end).cast("timestamp")
    val in = events.filter(
      col(ts) >= lit(horizons.map(_._2).min).cast("timestamp") &&
      col(ts) < endTs)
    val aggs = horizons.flatMap { case (label, start) =>
      val inWin = col(ts) >= lit(start).cast("timestamp")
      Seq(
        count(when(inWin, 1)).as(s"txn_count_$label"),
        coalesce(dsum(when(inWin, col(value))), lit(0.0))
          .as(s"total_value_$label"))
    }
    in.groupBy(col(entity).as("entity_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Velocity (recent-vs-prior change rate, reference
    * gmv_velocity_pct): (recent - prior) / (prior + 1), rounded 6dp.
    * Single shuffle via conditional aggregation.
    */
  def velocity(events: DataFrame, entity: String, ts: String, value: String,
               priorStart: String, mid: String, end: String): DataFrame = {
    val in = events.filter(col(ts) >= lit(priorStart).cast("timestamp") &&
                           col(ts) < lit(end).cast("timestamp"))
    val recent = coalesce(
      dsum(when(col(ts) >= lit(mid).cast("timestamp"), col(value))), lit(0.0))
    val prior = coalesce(
      dsum(when(col(ts) < lit(mid).cast("timestamp"), col(value))), lit(0.0))
    in.groupBy(col(entity).as("entity_id"))
      .agg(recent.as("recent_value"), prior.as("prior_value"))
      .withColumn("velocity_pct",
        round((col("recent_value") - col("prior_value")) /
              (col("prior_value") + 1.0), 6))
  }
}
