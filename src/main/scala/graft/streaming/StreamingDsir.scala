package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.operators.Dsir

/** Streaming DSIR model maintenance: each micro-batch of documents
  * folds its hashed-ngram counts into the persisted DSIR count store
  * ([[Dsir.upsertModelCounts]] with the batch id as the shard id).
  * EXACTLY-ONCE by the store's own ledger: a replayed batch's shard
  * id is already applied, so the upsert no-ops and counts can never
  * double under crash/replay — no sink-side transaction needed.
  *
  * This runs the ESTIMATION half of DSIR continuously: the corpus is
  * never rescanned, the count MERGE touches only the bucket-range
  * files a batch hits, and any serving or curation job freezes the
  * current artifact on demand ([[Dsir.freezeFromStore]], ≤ nBuckets
  * rows) to score with the one-projection frozen path
  * ([[Dsir.scoreFrozen]]). Target membership of streamed docs is the
  * same `isTarget` predicate used at build time — ship target-slice
  * updates through the same stream.
  */
object StreamingDsir {

  /** Attach the model-maintenance foreachBatch to a document stream
    * with `doc_id` and `text` columns. The store must be pre-built
    * ([[Dsir.buildModelStore]]) — nBuckets/alpha are pinned there.
    */
  def writer(docs: DataFrame, root: String, isTarget: Column)
  : DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        Dsir.upsertModelCounts(batch, "doc_id", "text", isTarget, root,
          s"batch-$batchId")
        ()
      }
    }

  /** Convenience: start the sink with a checkpoint + trigger. */
  def start(docs: DataFrame, root: String, isTarget: Column,
            checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    writer(docs, root, isTarget)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
