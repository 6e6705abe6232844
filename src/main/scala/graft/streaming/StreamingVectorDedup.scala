package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.offline.VersionedStore
import graft.operators.Dedup

/** Streaming embedding dedup: each micro-batch of vectors dedups
  * against a persisted IVF index used as state
  * (Dedup.embeddingSemdedupIncremental) and lands its survivors in a
  * VersionedStore table — the vector twin of [[StreamingNearDedup]],
  * sharing its exactly-once design: the output MERGE (by vec_id,
  * idempotent) rides the `beforeRegister` hook, so it commits BEFORE
  * the batch registers in the index. Replays recompute the identical
  * survivor frame (a replayed batch's own ids are excluded from the
  * state side) and re-merge the same rows — every crash window lands
  * each surviving vector exactly once.
  *
  * The index must be PRE-BUILT from a seed corpus
  * (Ann.ivfBuildIndex): a coarse quantizer trained on one micro-batch
  * would cell the stream arbitrarily, and the frozen centroids are
  * what make incremental results reproducible. Rebuild the index when
  * centroid drift degrades recall (the ivfIndexUpsert caveat); as
  * upserts accumulate, run Ann.ivfIndexCompact periodically so the
  * per-batch cell-pruned state read keeps opening ~1 file per cell.
  */
object StreamingVectorDedup {

  /** Attach the vector-dedup foreachBatch to a stream with `vec_id`
    * (long, globally unique, ascending across batches) and
    * `embedding` (array<float>) columns. Extra columns ride along
    * into the out table.
    */
  def writer(vectors: DataFrame, indexRoot: String, outTable: String,
             threshold: Double,
             compactEvery: Int = 0, compactFiles: Int = 64)
  : DataStreamWriter[org.apache.spark.sql.Row] =
    vectors.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        Dedup.embeddingSemdedupIncremental(batch, "vec_id", "embedding",
          indexRoot, threshold,
          beforeRegister = survivors => {
            val keep = batch.join(survivors, Seq("vec_id"), "left_semi")
            if (!keep.isEmpty) {
              if (VersionedStore.latestVersion(spark, outTable) < 0)
                VersionedStore.create(keep, outTable)
              else VersionedStore.merge(keep, outTable, Seq("vec_id"))
            }
          })
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          graft.operators.Ann.ivfIndexCompact(spark, indexRoot,
            compactFiles)
        ()
      }
    }

  /** Convenience: start the sink with a processing-time trigger. */
  def start(vectors: DataFrame, indexRoot: String, outTable: String,
            checkpoint: String, threshold: Double,
            compactEvery: Int = 0, compactFiles: Int = 64,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    writer(vectors, indexRoot, outTable, threshold, compactEvery,
      compactFiles)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
