package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.offline.VersionedStore

/** Stream → versioned table: lands each micro-batch as a VersionedStore
  * commit via foreachBatch, so the continuously-materialized table
  * keeps full snapshot history — a training job can pin `versionAsOf`
  * the version it started from while ingestion keeps appending
  * (snapshot isolation), the streaming analogue of the reference's
  * Iceberg-committing materializer (reference src/main/java/.../store/
  * offline/IcebergOfflineStore.java snapshot-per-write).
  *
  * Exactly-once caveat, stated honestly: foreachBatch is
  * at-least-once across restarts — a batch replayed after a crash
  * between commit and checkpoint becomes a duplicate version. The
  * manifest's append-only history makes such replays AUDITABLE
  * (identical batch content in adjacent versions) and `mergeByKey`
  * idempotent ingestion (merge on the batch's key columns) makes them
  * harmless — use merge mode for keyed upsert streams.
  */
object StreamingVersionedSink {

  /** Attach a VersionedStore-committing foreachBatch to `events`.
    * `keys` empty → every batch is an append commit; non-empty →
    * each batch is a MERGE by those keys (idempotent under replay).
    */
  def writer(events: DataFrame, tablePath: String,
             keys: Seq[String] = Nil): DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        if (VersionedStore.latestVersion(spark, tablePath) < 0)
          VersionedStore.create(batch, tablePath)
        else if (keys.nonEmpty)
          VersionedStore.merge(batch, tablePath, keys)
        else
          VersionedStore.append(batch, tablePath)
      }
      ()
    }

  /** Convenience: start the sink with a processing-time trigger. */
  def start(events: DataFrame, tablePath: String, checkpoint: String,
            keys: Seq[String] = Nil,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    writer(events, tablePath, keys)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
