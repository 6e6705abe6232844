package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.WindowedFeatures.dsum

/** Per-entity time-series analytics: rolling frames, cumulative
  * state, and top-N — the remaining window-operator classes a feature
  * pipeline needs beyond plain aggregates.
  *
  * All three shuffle ONCE on the entity key and sort within
  * partitions; frames never materialize more than the frame width
  * per row. At 100 TB the entity-hash shuffle is the only data
  * movement.
  */
object Analytics {

  /** Rolling mean over the current + `nPrev` preceding events per
    * entity (rows frame — deterministic tie-break via idCol).
    */
  def rollingAvg(events: DataFrame, entity: String, ts: String,
                 value: String, idCol: String, nPrev: Int): DataFrame = {
    val w = Window.partitionBy(entity).orderBy(col(ts), col(idCol))
      .rowsBetween(-nPrev, Window.currentRow)
    events.select(
      col(entity).as("entity_id"),
      col(idCol).as("event_id"),
      unix_millis(col(ts)).as("ts_ms"),
      col(value).as("value"),
      round(avg(col(value).cast("decimal(18,2)")).over(w).cast("double"), 6)
        .as("rolling_avg"))
  }

  /** Running (cumulative) total and event ordinal per entity. */
  def cumulative(events: DataFrame, entity: String, ts: String,
                 value: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(entity).orderBy(col(ts), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(
      col(entity).as("entity_id"),
      col(idCol).as("event_id"),
      unix_millis(col(ts)).as("ts_ms"),
      sum(col(value).cast("decimal(18,2)")).over(w).cast("double")
        .as("running_total"),
      count(lit(1)).over(w).as("event_ordinal"))
  }

  /** Top-N rows per entity by value (ties broken by idCol asc). */
  def topNPerGroup(events: DataFrame, entity: String, value: String,
                   idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(entity)
      .orderBy(col(value).desc, col(idCol))
    events.select(
      col(entity).as("entity_id"),
      col(idCol).as("event_id"),
      col(value).as("value"),
      row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= n)
  }
}
