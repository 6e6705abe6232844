package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.operators.Sketch

/** Continuous distribution maintenance: each micro-batch folds into
  * the persisted quantile-sample store via
  * [[Sketch.upsertQuantileSample]] — the distribution member of the
  * continuous-ingest family, completing the sketch-store symmetry
  * (HLL "how many distinct" → [[StreamingSketch]], CM "how frequent"
  * → [[StreamingCm]], KMV "how much shared" → [[StreamingKmv]],
  * bottom-k samples "how distributed" → this). The store must be
  * pre-built ([[Sketch.buildQuantileStore]]); readers get per-slice
  * quantiles from slices × k stored rows at any time
  * ([[Sketch.readQuantiles]]) with zero corpus IO.
  *
  * Exactly-once TWICE over: ledger no-ops replayed batch ids, and the
  * bottom-k-by-md5(id) re-trim is idempotent and order-independent
  * (the KMV argument), so a batch slipping past the ledger could not
  * change the stored sample either.
  */
object StreamingQuantile {

  def writer(rows: DataFrame, valueCol: String, idCol: String,
             sliceCol: String,
             root: String): DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        Sketch.upsertQuantileSample(batch, valueCol, idCol, sliceCol,
          root, s"batch-$batchId")
        ()
      }
    }

  /** Convenience: start the sink with a checkpoint + trigger. k is a
    * store property frozen at [[Sketch.buildQuantileStore]] time —
    * the sink reads it back, so a misconfigured stream cannot trim
    * stored sample rows away. */
  def start(rows: DataFrame, valueCol: String, idCol: String,
            sliceCol: String, root: String, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    writer(rows, valueCol, idCol, sliceCol, root)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
