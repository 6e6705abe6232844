package graft.offline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine-wide EXACTLY-ONCE additive ingest/retract protocol,
  * shared by every persisted count store (CM cells, Dsir gram counts,
  * KN bigram types, BPE word counts, ExactSubstr grams).
  *
  * Additive counts have no idempotence net: the classic
  * counts-first/ledger-last ordering leaves a crash window where a
  * replayed shard double-counts — tolerable for a one-sided
  * estimator, silent corruption for stores whose counts are declared
  * EXACT (model fits, freeze artifacts and retraction arithmetic all
  * read them). So both verbs write an INTENT row BEFORE the keyed
  * merge and a DONE row after. The intent carries TWO pieces of
  * recovery evidence: the expected post-operation total AND the
  * counts table's VersionedStore version at intent time. A crashed
  * attempt's retry checks the version first — still at the intent's
  * version means the merge never landed (redo); exactly the merge's
  * own commits ahead AND the total matching means it landed (finish
  * the ledger); anything else fails LOUDLY. Recovery assumes the
  * retry is the NEXT operation on the store (what foreachBatch
  * replay provides, and what the single-maintainer discipline
  * requires); the version+total double evidence makes an accidental
  * silent mismatch require both a single interleaved commit and an
  * exactly-equal count delta, instead of resting on the total alone.
  *
  * Ledger grammar (one `shard_id` string column, append-only):
  * `shardId` = completed ingest, `retract:shardId` = completed
  * retraction, `ingest-intent:shardId:gen:total:version` /
  * `retract-intent:shardId:gen:total:version` = in-flight markers. A
  * shard is CURRENTLY APPLIED iff ingests > retractions
  * (generation-counted, so ingest → retract → ingest cycles work).
  * Rows are colon-framed, so shard ids must not contain ':' anywhere
  * — shard 'a:1''s markers would otherwise parse as shard 'a''s
  * during recovery.
  *
  * The keyed merges themselves are also shared here ([[signedMerge]])
  * so the five stores cannot drift in join/null/retirement mechanics:
  * combined = shard LEFT-OUTER current on the key columns, each value
  * column coalesced and added (sign +1) or subtracted (sign −1);
  * retraction then retires rows whose every value column reached 0 —
  * guarded by an exact would-empty row count (deleteKeys refuses to
  * empty a table; the residue zero rows are filtered by every
  * store's readers).
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

  /** CURRENTLY APPLIED = ingests outnumber retractions. The cheap
    * pre-flight for upserts: a replayed already-applied shard answers
    * here before any params/shard work is paid. */
  def isApplied(spark: SparkSession, appliedTable: String,
                shardId: String): Boolean = {
    val ledger = rows(spark, appliedTable, shardId)
    ledger.count(_ == shardId) > ledger.count(_ == s"retract:$shardId")
  }

  /** Σ over `valCols` of the frame — the count evidence recovery
    * compares (one definition for intent-writing AND recovery, per
    * store). */
  private def massOf(df: DataFrame, valCols: Seq[String]): Long =
    df.agg(valCols.map(v => coalesce(sum(col(v)), lit(0L)))
        .reduce(_ + _).as("m"))
      .head().getLong(0)

  /** The one keyed signed merge every store rides: shard (keys ++
    * valCols) joined left-outer onto the current counts, each value
    * column `cur + sign·shard`. Returns the combined frame it wrote
    * (checkpointed — callers and retirement reuse it without
    * recompute). */
  private def signedMerge(spark: SparkSession, countsTable: String,
                          keys: Seq[String], valCols: Seq[String],
                          shard: DataFrame, sign: Int): DataFrame = {
    val cur = VersionedStore.read(spark, countsTable)
      .select((keys ++ valCols).map(col): _*)
      .select(keys.map(col) ++
        valCols.map(v => col(v).as(s"__cur_$v")): _*)
    val combined = shard.join(cur, keys, "left_outer")
      .select(keys.map(col) ++ valCols.map(v =>
        (coalesce(col(s"__cur_$v"), lit(0L)) +
          lit(sign.toLong) * col(v)).as(v)): _*)
      .localCheckpoint(false)
    VersionedStore.merge(combined, countsTable, keys)
    combined
  }

  /** Delete rows whose every value column is ≤ 0 — with an EXACT
    * would-empty guard instead of a catch (deleteKeys also raises
    * IllegalArgumentException for genuine misuse, which must stay
    * loud): when deleting the zeros would empty the table they stay
    * as residue, and every store's readers filter them. */
  private def retireExhausted(spark: SparkSession, countsTable: String,
                              keys: Seq[String],
                              valCols: Seq[String]): Unit = {
    val table = VersionedStore.read(spark, countsTable)
    val zeros = table
      .filter(valCols.map(v => col(v) <= 0L).reduce(_ && _))
      .select(keys.map(col): _*)
      .localCheckpoint(false)
    val nZero = zeros.count()
    if (nZero > 0 && nZero < table.count()) {
      VersionedStore.deleteKeys(zeros, countsTable, keys)
      ()
    }
  }

  /** Ingest `shard` (columns: keys ++ valCols, the additive
    * contribution) exactly once. Returns whether the shard was
    * applied (false = already applied, a no-op replay). */
  def ingestOnce(spark: SparkSession, appliedTable: String,
                 countsTable: String, keys: Seq[String],
                 valCols: Seq[String], shard: DataFrame,
                 shardId: String): Boolean =
    runOnce(spark, appliedTable, countsTable, keys, valCols, shard,
      shardId, ingest = true)

  /** Subtract a previously-ingested `shard` exactly once, retiring
    * rows whose counts reach zero. Returns false when the shard is
    * not currently applied (never ingested, or already retracted;
    * generation-counted, so ingest → retract → ingest cycles
    * work). */
  def retractOnce(spark: SparkSession, appliedTable: String,
                  countsTable: String, keys: Seq[String],
                  valCols: Seq[String], shard: DataFrame,
                  shardId: String): Boolean =
    runOnce(spark, appliedTable, countsTable, keys, valCols, shard,
      shardId, ingest = false)

  private def runOnce(spark: SparkSession, appliedTable: String,
                      countsTable: String, keys: Seq[String],
                      valCols: Seq[String], shard: DataFrame,
                      shardId: String, ingest: Boolean): Boolean = {
    import spark.implicits._
    requireFrameFree(shardId)
    val verb = if (ingest) "ingest" else "retract"
    val doneRow = if (ingest) shardId else s"retract:$shardId"
    val ledger = rows(spark, appliedTable, shardId)
    val ingests = ledger.count(_ == shardId)
    val retracts = ledger.count(_ == s"retract:$shardId")
    if (ingest && ingests > retracts) return false
    if (!ingest && ingests <= retracts) return false
    val gen = (if (ingest) ingests else retracts) + 1
    val sign = if (ingest) 1 else -1
    val pinned = shard.localCheckpoint(false)
    val st = massOf(pinned, valCols)
    def total(): Long =
      massOf(VersionedStore.read(spark, countsTable), valCols)
    def version(): Long = VersionedStore.latestVersion(spark, countsTable)
    def finish(): Boolean = {
      if (!ingest) retireExhausted(spark, countsTable, keys, valCols)
      VersionedStore.append(Seq(doneRow).toDF("shard_id"), appliedTable)
      true
    }
    val intentPrefix = s"$verb-intent:$shardId:$gen:"
    ledger.find(_.startsWith(intentPrefix)) match {
      case Some(intent) =>            // a prior attempt crashed
        val parts = intent.stripPrefix(intentPrefix).split(":")
        val exp = parts(0).toLong
        val v0 = parts(1).toLong
        val vNow = version()
        // how far past the intent's version OUR crashed attempt can
        // have moved the table: ingest merges once; retract merges
        // once and may have retired zeros in a second commit
        val maxAhead = if (ingest) 1 else 2
        if (vNow != v0) {
          if (vNow >= v0 + 1 && vNow <= v0 + maxAhead && total() == exp)
            return finish()
          throw new IllegalStateException(
            s"store ledger $appliedTable: $verb of '$shardId' found " +
              s"version $vNow / total ${total()}, expected version $v0 " +
              s"(pre) or $v0+1..$maxAhead ahead with total $exp (post) " +
              "- another writer interleaved; verify or rebuild the store")
        }
        // still at the intent's version: the merge never landed — the
        // total must still be the pre state, then redo below
        if (total() != exp - sign * st)
          throw new IllegalStateException(
            s"store ledger $appliedTable: $verb of '$shardId' found " +
              s"pre-version $v0 but total ${total()} != " +
              s"${exp - sign * st} - another writer interleaved; " +
              "verify or rebuild the store")
      case None =>
        VersionedStore.append(
          Seq(s"$intentPrefix${total() + sign * st}:${version()}")
            .toDF("shard_id"),
          appliedTable)
    }
    signedMerge(spark, countsTable, keys, valCols, pinned, sign)
    finish()
  }
}
