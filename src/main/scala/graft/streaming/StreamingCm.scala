package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.operators.Sketch

/** Continuous frequency maintenance: each micro-batch's keys fold
  * ADDITIVELY into the persisted Count-Min store via
  * [[Sketch.upsertCm]] — the frequency member of the continuous-ingest
  * family ([[StreamingSketch]] HLL registers, [[StreamingVocab]] word
  * counts, [[StreamingDsir]] count model). The store must be pre-built
  * ([[Sketch.buildCmStore]], which also freezes the hash family);
  * readers answer watchlist point frequencies from the stored cells at
  * any time ([[Sketch.readCmEstimates]]) without touching the ingested
  * corpus, and [[Sketch.cmStats]]/[[Sketch.cmJoinPlan]] read their
  * exact bounds from the same cells.
  *
  * Replay safety rests on the shard ledger ALONE here: unlike HLL's
  * register max, additive counts have no idempotence net — a replayed
  * batch that slipped past the ledger would double-count. Since round
  * 11 ingest is EXACTLY-once engine-wide
  * ([[graft.offline.Ledger.ingestOnce]]): an intent row carrying the
  * expected post-ingest total lands before the cell merge, the done
  * row after, and a restart inside the old
  * cells-committed/ledger-missing window recovers by comparing
  * totals instead of re-applying the batch.
  */
object StreamingCm {

  def writer(rows: DataFrame, keyCol: String,
             root: String): DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        Sketch.upsertCm(batch, keyCol, root, s"batch-$batchId")
        ()
      }
    }

  /** Convenience: start the sink with a checkpoint + trigger. */
  def start(rows: DataFrame, keyCol: String, root: String,
            checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    writer(rows, keyCol, root)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
