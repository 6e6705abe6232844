package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming materialization — the continuous analogue of
  * OfflineStore.latestSnapshot / materializeVectors, re-expressing
  * the reference's Kafka-consumer materialization loop
  * (reference src/main/java/.../service/MaterializationService.java)
  * as Structured Streaming.
  *
  * Two layers:
  *  - windowedAggs: watermarked event-time windows → per (entity,
  *    feature, window) aggregates. Late data beyond the watermark is
  *    dropped exactly like the reference's staleness cutoff.
  *  - latestSnapshot: per-(entity, feature) running latest value via
  *    mapGroupsWithState — the online-store writer. Out-of-order
  *    events never regress the snapshot (event-time guarded), which
  *    the reference gets implicitly from RocksDB compare-and-set.
  *
  * Scale: state is keyed by (entity, feature) → partitions scale
  * horizontally with the shuffle; watermark bounds state size for
  * windows; snapshot state is O(active keys), same as the online
  * store itself.
  */
object StreamingMaterialize {

  case class FeatureEvent(entity_id: String, feature_name: String,
                          value: Double, event_time: Timestamp)
  case class SnapshotRow(entity_id: String, feature_name: String,
                         value: Double, event_time: Timestamp,
                         update_count: Long)

  /** Watermarked sliding-window aggregates per (entity, feature). */
  def windowedAggs(events: DataFrame, watermarkDelay: String,
                   windowLength: String): DataFrame =
    events
      .withWatermark("event_time", watermarkDelay)
      .groupBy(col("entity_id"), col("feature_name"),
        window(col("event_time"), windowLength))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"),
        max(col("event_time")).as("last_seen"))

  /** Running latest-value snapshot with monotonic event-time guard. */
  def latestSnapshot(events: Dataset[FeatureEvent]): Dataset[SnapshotRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.entity_id, e.feature_name))
      .mapGroupsWithState[SnapshotRow, SnapshotRow](
        GroupStateTimeout.NoTimeout) {
        case ((entity, feature), batch, state: GroupState[SnapshotRow]) =>
          val incoming = batch.toSeq
          val newest = incoming.maxBy(e => (e.event_time.getTime, e.value))
          val prev = state.getOption
          val next = prev match {
            case Some(p) if p.event_time.getTime >= newest.event_time.getTime =>
              p.copy(update_count = p.update_count + incoming.size)
            case other =>
              SnapshotRow(entity, feature, newest.value, newest.event_time,
                other.map(_.update_count).getOrElse(0L) + incoming.size)
          }
          state.update(next)
          next
      }
  }
}
