package graft.offline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The engine-wide EXACTLY-ONCE additive-ingest protocol, shared by
  * every persisted count store (CM cells, Dsir gram counts, KN bigram
  * types, BPE word counts, ExactSubstr grams).
  *
  * Additive counts have no idempotence net: the classic
  * counts-first/ledger-last ordering leaves a crash window where a
  * replayed shard double-counts — tolerable for a one-sided
  * estimator, silent corruption for stores whose counts are declared
  * EXACT (model fits, freeze artifacts and retraction arithmetic all
  * read them). So ingest mirrors the retraction protocol
  * ([[graft.operators.Sketch.retractCm]]): an INTENT row carrying the
  * exact expected post-ingest total lands BEFORE the merge, the DONE
  * row (the plain shard id) after. A crashed attempt's retry compares
  * the store's current total against the intent and either just
  * finishes the ledger (merge landed), redoes the merge (it did not),
  * or fails LOUDLY when the total matches neither state — an
  * interleaved writer, which the single-maintainer-per-store
  * discipline forbids.
  *
  * Ledger grammar (one `shard_id` string column, append-only):
  * `shardId` = completed ingest, `retract:shardId` = completed
  * retraction, `ingest-intent:shardId:gen:total` /
  * `retract-intent:shardId:gen:total` = in-flight markers. A shard is
  * CURRENTLY APPLIED iff ingests > retractions (generation-counted,
  * so ingest → retract → ingest cycles work). Rows are colon-framed,
  * so shard ids must not contain ':' anywhere — shard 'a:1''s markers
  * would otherwise parse as shard 'a''s during recovery.
  */
object Ledger {

  def requireFrameFree(shardId: String): Unit =
    require(!shardId.contains(":"),
      s"shard id '$shardId' must not contain ':' (the ledger's frame " +
        "character)")

  /** Every ledger row concerning one shard, in one Spark job. */
  def rows(spark: SparkSession, appliedTable: String,
           shardId: String): Seq[String] =
    VersionedStore.read(spark, appliedTable)
      .filter(col("shard_id") === shardId ||
        col("shard_id") === s"retract:$shardId" ||
        col("shard_id").startsWith(s"ingest-intent:$shardId:") ||
        col("shard_id").startsWith(s"retract-intent:$shardId:"))
      .collect().map(_.getString(0)).toSeq

  /** Run `merge` (the store's keyed additive MERGE) exactly once for
    * `shardId`. `total` must return the store's current summed count
    * and `shardTotal` the shard's contribution — the pre/post
    * evidence the crash recovery compares. Returns whether the shard
    * was applied (false = already applied, a no-op replay). */
  def ingestOnce(spark: SparkSession, appliedTable: String,
                 shardId: String, total: () => Long,
                 shardTotal: () => Long)(merge: => Unit): Boolean = {
    import spark.implicits._
    requireFrameFree(shardId)
    val ledger = rows(spark, appliedTable, shardId)
    val ingests = ledger.count(_ == shardId)
    if (ingests > ledger.count(_ == s"retract:$shardId")) return false
    val gen = ingests + 1
    val st = shardTotal()
    val intentPrefix = s"ingest-intent:$shardId:$gen:"
    ledger.find(_.startsWith(intentPrefix)) match {
      case Some(intent) =>            // a prior attempt crashed
        val exp = intent.stripPrefix(intentPrefix).toLong
        val cur = total()
        if (cur == exp) {             // merge landed, DONE row did not
          VersionedStore.append(Seq(shardId).toDF("shard_id"),
            appliedTable)
          return true
        }
        if (cur != exp - st)          // neither pre nor post state
          throw new IllegalStateException(
            s"store ledger $appliedTable: ingest of '$shardId' found " +
              s"total $cur, expected $exp (post) or ${exp - st} (pre) - " +
              "another writer interleaved; verify or rebuild the store")
      case None =>
        VersionedStore.append(
          Seq(s"$intentPrefix${total() + st}").toDF("shard_id"),
          appliedTable)
    }
    merge
    VersionedStore.append(Seq(shardId).toDF("shard_id"), appliedTable)
    true
  }

  /** Run `merge` (the store's keyed SUBTRACTIVE merge) exactly once
    * for a previously-ingested `shardId` — the right-to-be-forgotten
    * side of the protocol ([[graft.operators.Sketch.retractCm]]'s
    * semantics, shared): a double subtraction would UNDERCOUNT, the
    * forbidden direction, so the same intent/done recovery applies
    * with inverted expectations. Returns false when the shard is not
    * currently applied (never ingested, or already retracted;
    * generation-counted, so ingest → retract → ingest cycles work).
    * Retirement of exhausted rows and zero-residue filtering are the
    * store's job inside `merge` — counts here only prove pre/post. */
  def retractOnce(spark: SparkSession, appliedTable: String,
                  shardId: String, total: () => Long,
                  shardTotal: () => Long)(merge: => Unit): Boolean = {
    import spark.implicits._
    requireFrameFree(shardId)
    val ledger = rows(spark, appliedTable, shardId)
    val retracts = ledger.count(_ == s"retract:$shardId")
    if (ledger.count(_ == shardId) <= retracts) return false
    val gen = retracts + 1
    val st = shardTotal()
    val intentPrefix = s"retract-intent:$shardId:$gen:"
    ledger.find(_.startsWith(intentPrefix)) match {
      case Some(intent) =>            // a prior attempt crashed
        val exp = intent.stripPrefix(intentPrefix).toLong
        val cur = total()
        if (cur == exp) {             // merge landed, DONE row did not
          VersionedStore.append(
            Seq(s"retract:$shardId").toDF("shard_id"), appliedTable)
          return true
        }
        if (cur != exp + st)          // neither pre nor post state
          throw new IllegalStateException(
            s"store ledger $appliedTable: retraction of '$shardId' " +
              s"found total $cur, expected $exp (post) or ${exp + st} " +
              "(pre) - another writer interleaved; verify or rebuild " +
              "the store")
      case None =>
        VersionedStore.append(
          Seq(s"$intentPrefix${total() - st}").toDF("shard_id"),
          appliedTable)
    }
    merge
    VersionedStore.append(Seq(s"retract:$shardId").toDF("shard_id"),
      appliedTable)
    true
  }
}
