package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.operators.Bpe

/** Continuous tokenizer-vocabulary maintenance: each micro-batch of
  * documents folds its word counts into the persisted BPE store via
  * [[Bpe.upsertVocabCounts]] — the tokenizer member of the
  * continuous-ingest family ([[StreamingDsir]] count model,
  * [[StreamingSearchIndex]] posting index, [[StreamingVectorDedup]]
  * IVF state). The store must be pre-built
  * ([[Bpe.buildVocabStore]]).
  *
  * Exactly-once: the shard id is the batch id, and ingest runs the
  * engine-wide intent/done protocol
  * ([[graft.offline.Ledger.ingestOnce]]), so a replay no-ops and even
  * a crash between the counts commit and the ledger row recovers
  * without double-counting.
  *
  * RETRAINING is deliberately decoupled from ingestion — counts are
  * cheap to fold continuously, rules are expensive to retrain — but
  * `refreshEvery` > 0 runs the drift decision every N batches:
  * [[Bpe.refreshVocab]] retrains from the STORED counts only when
  * token-mass drift against the serving rules exceeds `maxDrift`.
  * The cadence story of compaction on the other streaming sinks.
  */
object StreamingVocab {

  def writer(docs: DataFrame, root: String, refreshEvery: Int = 0,
             maxDrift: Double = 0.1)
  : DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        Bpe.upsertVocabCounts(batch, "doc_id", "text", root,
          s"batch-$batchId")
        if (refreshEvery > 0 && (batchId + 1) % refreshEvery == 0) {
          Bpe.refreshVocab(batch.sparkSession, root, maxDrift)
          ()
        }
        ()
      }
    }

  /** Convenience: start the sink with a checkpoint + trigger. */
  def start(docs: DataFrame, root: String, checkpoint: String,
            refreshEvery: Int = 0, maxDrift: Double = 0.1,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    writer(docs, root, refreshEvery, maxDrift)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
