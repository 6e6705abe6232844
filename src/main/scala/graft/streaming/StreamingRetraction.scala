package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.online.OnlineStore
import graft.operators.{Ann, Search}

/** Stream → deletion, the retraction dual of the continuous-ingest
  * family ([[StreamingServing]] upserts, [[StreamingSearchIndex]]
  * posting refreshes, [[StreamingVectorDedup]] index state): each
  * micro-batch of KEYS is removed from a persisted artifact — the
  * shape a right-to-be-forgotten / takedown queue has in production
  * (a trickle of ids arriving continuously, each of which must stop
  * serving promptly without an index rebuild).
  *
  * Exactly-once by idempotence, no output hook needed, matching each
  * target's batch-delete contract:
  *  - serving snapshots: a pruned copy-on-write delete; replaying a
  *    batch whose keys are already gone removes nothing (content
  *    converges, the anti-join is a fixed point);
  *  - text index: tombstone MERGE by doc_id — a replay rewrites the
  *    identical ledger rows ([[graft.operators.Search.indexDelete]]);
  *  - IVF index: copy-on-write delete on the inverted file(s), same
  *    fixed-point argument as snapshots.
  *
  * Deletion volume is assumed queue-shaped (small batches). The
  * sweeps/compactions stay on their usual cadence: tombstoned
  * postings are excluded from serving immediately and swept by the
  * next [[graft.operators.Search.compactTextIndex]]; snapshot and IVF
  * deletes physically rewrite at delete time (pruned).
  *
  * One batch shape cannot be applied: a delete that would remove the
  * LAST remaining rows of a copy-on-write target (empty snapshots are
  * unrepresentable — VersionedStore.deleteKeys refuses). Left alone
  * that refusal would permanently fail the stream: every restart
  * replays the same committed-offset batch and re-throws. Instead the
  * writers catch exactly that refusal and append the batch's keys to
  * a `<target>_retraction_deadletter` parquet dir (logged, nothing
  * silently dropped) so the queue keeps draining; an operator
  * resolves the dead letters by retiring the table (overwrite /
  * vacuum), which is the only correct end-state for "delete
  * everything".
  */
object StreamingRetraction {

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger(StreamingRetraction.getClass)

  /** Dead-letter location for a retraction target. */
  def deadLetterPath(target: String): String =
    target.stripSuffix("/") + "_retraction_deadletter"

  private def retractOrDeadLetter(batch: DataFrame, target: String)
                                 (delete: => Unit): Unit =
    try delete catch {
      case e: IllegalArgumentException
          if e.getMessage != null &&
            e.getMessage.contains("would remove every row") =>
        val dl = deadLetterPath(target)
        batch.write.mode("append").parquet(dl)
        log.warn(s"retraction batch would empty $target " +
          s"(${e.getMessage}); keys dead-lettered to $dl")
    }

  /** Retract entities from a published serving snapshot; the incoming
    * frame carries the snapshot's key column. */
  def snapshotWriter(keys: DataFrame, root: String)
  : DataStreamWriter[org.apache.spark.sql.Row] =
    keys.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) retractOrDeadLetter(batch, root) {
        OnlineStore.deleteSnapshotKeys(batch, root); ()
      }
      ()
    }

  def startSnapshot(keys: DataFrame, root: String, checkpoint: String,
                    trigger: Trigger = Trigger.ProcessingTime(0L))
  : StreamingQuery =
    snapshotWriter(keys, root)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Retract documents from a persisted text-retrieval index
    * (tombstone now, physical sweep at the next compaction). */
  def textIndexWriter(ids: DataFrame, idCol: String, indexRoot: String)
  : DataStreamWriter[org.apache.spark.sql.Row] =
    ids.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) {
        Search.indexDelete(batch.sparkSession, batch, idCol, indexRoot)
      }
      ()
    }

  def startTextIndex(ids: DataFrame, idCol: String, indexRoot: String,
                     checkpoint: String,
                     trigger: Trigger = Trigger.ProcessingTime(0L))
  : StreamingQuery =
    textIndexWriter(ids, idCol, indexRoot)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Retract vectors from a persisted IVF / IVF-SQ8 index. */
  def ivfWriter(ids: DataFrame, idCol: String, indexRoot: String)
  : DataStreamWriter[org.apache.spark.sql.Row] =
    ids.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) retractOrDeadLetter(batch, indexRoot) {
        Ann.ivfIndexDelete(batch, indexRoot, idCol)
      }
      ()
    }

  def startIvf(ids: DataFrame, idCol: String, indexRoot: String,
               checkpoint: String,
               trigger: Trigger = Trigger.ProcessingTime(0L))
  : StreamingQuery =
    ivfWriter(ids, idCol, indexRoot)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
