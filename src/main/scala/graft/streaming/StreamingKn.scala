package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.operators.TextAnalysis

/** Continuous Kneser-Ney count maintenance: each micro-batch of
  * documents folds its bigram-type counts ADDITIVELY into the
  * persisted KN store via [[TextAnalysis.knUpsertCounts]] — the LM
  * member of the continuous-ingest family ([[StreamingCm]] frequency
  * cells, [[StreamingVocab]] word counts, [[StreamingDsir]] count
  * model), completing the symmetry: every additive count store now
  * has a micro-batch twin. The store must be pre-built
  * ([[TextAnalysis.knBuildStore]], which freezes the discount);
  * [[TextAnalysis.knFreezeFromStore]] derives a fresh scoring
  * artifact from the stored counts at any time — no corpus rescan —
  * and [[TextAnalysis.knScoreFrozen]] applies it, including inside
  * another stream (the score path is a pure projection).
  *
  * Replay safety: EXACTLY-once by the engine-wide intent/done ingest
  * protocol ([[graft.offline.Ledger.ingestOnce]]) — a micro-batch
  * replayed across any crash window either no-ops or completes,
  * never double-counts.
  */
object StreamingKn {

  def writer(docs: DataFrame, idCol: String, textCol: String,
             root: String): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        TextAnalysis.knUpsertCounts(batch, idCol, textCol, root,
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
