package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.operators.Dedup

/** Continuous ExactSubstr gram maintenance: each micro-batch of
  * documents folds its positional-gram counts ADDITIVELY into the
  * persisted gram store via [[Dedup.upsertSubstrShard]] — the
  * dedup-family member of the continuous-ingest set ([[StreamingKn]]
  * bigram types, [[StreamingCm]] frequency cells, [[StreamingVocab]]
  * word counts, [[StreamingDsir]] count model). The store must be
  * pre-built ([[Dedup.buildSubstrStore]], which freezes n);
  * [[Dedup.substrSpansIncremental]] then detects new shards against
  * everything ingested so far with no corpus rescan, and
  * [[Dedup.freezeDupGramsFromStore]] derives a fresh
  * [[Dedup.exactSubstrFrozen]] artifact from the stored counts at
  * any time.
  *
  * Replay safety: EXACTLY-once by the engine-wide intent/done ingest
  * protocol ([[graft.offline.Ledger.ingestOnce]]) — a micro-batch
  * replayed across any crash window either no-ops or completes,
  * never double-counts (spec-held by the deleted-done-row crash
  * simulation in LlmPipelineSpec).
  */
object StreamingSubstr {

  def writer(docs: DataFrame, idCol: String, textCol: String,
             root: String): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        Dedup.upsertSubstrShard(batch, idCol, textCol, root,
          s"batch-$batchId")
        ()
      }
    }

  /** Convenience: start the sink with a checkpoint + trigger. */
  def start(docs: DataFrame, idCol: String, textCol: String, root: String,
            checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    writer(docs, idCol, textCol, root)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
