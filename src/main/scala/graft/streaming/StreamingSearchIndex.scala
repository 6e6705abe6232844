package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.operators.Search

/** Continuous retrieval-index maintenance: each micro-batch of
  * documents folds into the persisted BM25 posting-list index via
  * [[Search.indexUpsert]] — the text-retrieval member of the
  * continuous-ingest family ([[StreamingNearDedup]] text dedup state,
  * [[StreamingVectorDedup]] IVF dedup state, [[StreamingServing]]
  * point-read snapshots).
  *
  * Exactly-once by idempotence, with no output hook needed: the
  * upsert MERGEs postings and doc lengths by doc_id and then
  * RECOMPUTES the corpus stats from the merged dlens head (no
  * delta arithmetic — the stats are a pure function of the dlens
  * table), so a replayed micro-batch rewrites identical rows and
  * recomputes identical stats — the index converges to the same
  * state no matter how many times a crash window re-delivers a
  * batch.
  *
  * The index must be PRE-BUILT ([[Search.buildTextIndex]]), even if
  * from an empty-ish seed — serve-side term pruning relies on the
  * tables existing. As upserts accumulate, MERGE files span wide term
  * ranges and erode the term-sorted layout; `compactEvery` re-sorts
  * periodically ([[Search.compactTextIndex]]), same cadence story as
  * the other streaming state sinks.
  */
object StreamingSearchIndex {

  /** Attach the index-maintenance foreachBatch to a stream with
    * document id and text columns. */
  def writer(docs: DataFrame, indexRoot: String, idCol: String,
             textCol: String, compactEvery: Int = 0,
             compactFiles: Int = 16)
  : DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        Search.indexUpsert(batch.sparkSession, batch, idCol, textCol,
          indexRoot)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          Search.compactTextIndex(batch.sparkSession, indexRoot,
            compactFiles)
        ()
      }
    }

  /** Convenience: start the sink with a processing-time trigger. */
  def start(docs: DataFrame, indexRoot: String, idCol: String,
            textCol: String, checkpoint: String, compactEvery: Int = 0,
            compactFiles: Int = 16,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    writer(docs, indexRoot, idCol, textCol, compactEvery, compactFiles)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
