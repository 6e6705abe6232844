package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.operators.Sketch

/** Continuous slice-overlap maintenance: each micro-batch's keys fold
  * into the persisted KMV bottom-k store via [[Sketch.upsertKmv]] —
  * the overlap member of the continuous-ingest family. The store must
  * be pre-built ([[Sketch.buildKmvStore]]); readers answer all-pairs
  * slice Jaccard from slices × k stored rows at any time
  * ([[Sketch.readOverlap]]) without a corpus-sized self-join.
  *
  * Exactly-once TWICE over, like the HLL twin: the shard ledger
  * no-ops replayed batch ids, and the bottom-k re-trim is itself
  * idempotent and order-independent (a key below the kept threshold
  * is never displaced by re-arrival), so even a batch that slipped
  * past the ledger could not change the sketch.
  */
object StreamingKmv {

  def writer(rows: DataFrame, keyCol: String, sliceCol: String,
             root: String): DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        Sketch.upsertKmv(batch, keyCol, sliceCol, root, s"batch-$batchId")
        ()
      }
    }

  /** Convenience: start the sink with a checkpoint + trigger. k is a
    * store property frozen at [[Sketch.buildKmvStore]] time — the
    * sink reads it back, so a misconfigured stream cannot trim stored
    * sample rows away. */
  def start(rows: DataFrame, keyCol: String, sliceCol: String,
            root: String, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    writer(rows, keyCol, sliceCol, root)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
