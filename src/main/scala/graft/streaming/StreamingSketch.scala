package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.operators.Sketch

/** Continuous cardinality maintenance: each micro-batch's keys fold
  * into the persisted HLL sketch store via [[Sketch.upsertSketches]]
  * — the sketch member of the continuous-ingest family
  * ([[StreamingVocab]] word counts, [[StreamingDsir]] count model,
  * [[StreamingSearchIndex]] posting index). The store must be
  * pre-built ([[Sketch.buildSketchStore]]); readers get per-slice /
  * global distinct estimates from kilobytes of registers at any time
  * ([[Sketch.readDistinct]]) without touching the ingested corpus.
  *
  * Exactly-once TWICE over: the shard ledger no-ops replayed batch
  * ids (the family contract), and register max is itself idempotent
  * — a double-fold cannot change a sketch even if the ledger were
  * lost, which makes this the most crash-tolerant of the persisted
  * artifacts.
  */
object StreamingSketch {

  def writer(rows: DataFrame, keyCol: String, groupCols: Seq[String],
             root: String): DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        Sketch.upsertSketches(batch, keyCol, groupCols, root,
          s"batch-$batchId")
        ()
      }
    }

  /** Convenience: start the sink with a checkpoint + trigger. */
  def start(rows: DataFrame, keyCol: String, groupCols: Seq[String],
            root: String, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    writer(rows, keyCol, groupCols, root)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
