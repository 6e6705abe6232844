package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization: assign events to sessions split by
  * an inactivity gap, then aggregate per session. One shuffle on the
  * entity key; within-partition sort only (no second shuffle for the
  * session aggregate because session_id is entity-local).
  */
object Sessionize {
  def sessions(events: DataFrame, entity: String, ts: String, value: String,
               gapSeconds: Long, idCol: String = "event_id"): DataFrame = {
    import graft.operators.WindowedFeatures.dsum
    val w = Window.partitionBy(entity).orderBy(col(ts), col(idCol))
    val gapped = events
      .withColumn("prev_ts", lag(col(ts), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             unix_millis(col(ts)) - unix_millis(col("prev_ts")) > gapSeconds * 1000L,
          1).otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    gapped.groupBy(col(entity).as("entity_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_millis(col(ts))).as("start_ms"),
        max(unix_millis(col(ts))).as("end_ms"),
        dsum(col(value)).as("session_value"))
  }
}
