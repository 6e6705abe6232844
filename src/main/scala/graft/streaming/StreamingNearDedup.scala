package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.offline.VersionedStore
import graft.operators.Dedup

/** Streaming NEAR-dup ingest: each micro-batch dedups against the
  * persisted incremental-dedup state (exact hash → MinHash/LSH
  * candidates → exact Jaccard verify, Dedup.dedupIncremental) and
  * lands its surviving documents in a VersionedStore table — the
  * continuous twin of the batch Dedup.pipeline, and the missing
  * near-dup counterpart to StreamingDedup's exact-only
  * flatMapGroupsWithState path. State lives OUTSIDE stream state
  * (three VersionedStore tables), so it is shared with batch
  * backfills, survives checkpoint resets, and a micro-batch's cost is
  * batch-shaped: with `pruneStateDocs` on and key-sorted state
  * ([[graft.operators.Dedup.compactDedupState]]), each batch reads
  * only the state files its own keys can live in.
  *
  * Exactly-once, concretely: foreachBatch is at-least-once across
  * restarts, but the output commit rides dedupIncremental's
  * `beforeRegister` hook — survivors MERGE into the out table (by
  * doc_id, idempotent) BEFORE the batch registers in state. A replay
  * of a batch that crashed before registration recomputes identical
  * survivors (state reads pin the pre-registration version) and
  * re-merges the same rows; a replay of a fully-registered batch
  * dedups to nothing and merges nothing. Every crash window lands
  * each surviving doc in the out table exactly once.
  *
  * Ordering caveat, stated honestly: batch dedup keeps the MINIMUM
  * doc id of a duplicate cluster; streaming keeps the FIRST ARRIVAL.
  * The two agree exactly when micro-batches arrive in ascending
  * doc_id order (the spec's setup, and the natural shape for
  * monotonically-assigned ingest ids).
  */
object StreamingNearDedup {

  /** Attach the near-dedup foreachBatch to a stream with `doc_id`
    * (long, globally unique, ascending across batches) and `text`
    * columns. Extra columns ride along into the out table.
    *
    * @param compactEvery when > 0, every `compactEvery`-th batch ends
    *   by key-sorting + compacting the state tables
    *   (Dedup.compactDedupState) — each batch appends three state
    *   fragments, and the `pruneStateDocs` fast path only prunes well
    *   over key-sorted files, so a long-running stream needs this
    *   cadence (or an external maintenance job) to keep micro-batch
    *   cost batch-shaped. The compacting batch pays the rewrite;
    *   replayed compactions are idempotent (a fresh sorted rewrite).
    */
  def writer(docs: DataFrame, stateRoot: String, outTable: String,
             n: Int = 3, threshold: Double = 0.8,
             pruneStateDocs: Int = 0, compactEvery: Int = 0,
             compactFiles: Int = 64): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        Dedup.dedupIncremental(batch, "doc_id", "text", stateRoot,
          n, threshold, pruneStateDocs = pruneStateDocs,
          beforeRegister = survivors => {
            val keep = batch.join(survivors, Seq("doc_id"), "left_semi")
            if (!keep.isEmpty) {
              if (VersionedStore.latestVersion(spark, outTable) < 0)
                VersionedStore.create(keep, outTable)
              else VersionedStore.merge(keep, outTable, Seq("doc_id"))
            }
          })
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          Dedup.compactDedupState(spark, stateRoot, compactFiles)
        ()
      }
    }

  /** Convenience: start the sink with a processing-time trigger. */
  def start(docs: DataFrame, stateRoot: String, outTable: String,
            checkpoint: String, n: Int = 3, threshold: Double = 0.8,
            pruneStateDocs: Int = 0, compactEvery: Int = 0,
            compactFiles: Int = 64,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    writer(docs, stateRoot, outTable, n, threshold, pruneStateDocs,
      compactEvery, compactFiles)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
