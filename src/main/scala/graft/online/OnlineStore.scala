package graft.online

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Online-serving semantics over materialized vectors — the Spark
  * re-expression of the reference's OnlineServingService
  * (reference src/main/java/.../service/OnlineServingService.java):
  * batch multi-get by entity key against the latest materialized
  * snapshot.
  *
  * Scale design: the request key set is always small relative to the
  * snapshot → broadcast the KEYS and semi-join, so the snapshot (the
  * 100 TB side) never shuffles. An inner join keeps only requested
  * entities; missing entities simply produce no row (the reference
  * returns NOT_FOUND for those).
  */
object OnlineStore {

  /** Batch multi-get: `keys` must have an `entity_id` column. */
  def batchLookup(vectors: DataFrame, keys: DataFrame): DataFrame =
    vectors.join(broadcast(keys.select("entity_id").distinct()), Seq("entity_id"))

  // --- persisted point-read serving ---------------------------------

  private val BucketCol = "_kb"
  private def dataTable(root: String) = s"$root/data"
  private def metaTable(root: String) = s"$root/meta"

  /** PERSIST a materialized snapshot for point-read serving: rows gain
    * a stable hash bucket of the key column and are laid out sorted by
    * it (~contiguous bucket ranges per file), so a later
    * [[pointLookup]] prunes the read to the files whose bucket range
    * contains a requested key — the reference's RocksDB multi-get
    * shape (OnlineServingService.java batch lookup) re-expressed as
    * manifest-stat point reads: files opened ∝ key batch, not table
    * size. Repeated publishes overwrite (old versions stay
    * time-travelable); `nBuckets`/`keyCol` persist in a 1-row meta
    * table so serving needs no out-of-band config.
    */
  def publishSnapshot(vectors: DataFrame, root: String, keyCol: String,
                      nBuckets: Int = 256, numFiles: Int = 64): Long = {
    import graft.offline.VersionedStore
    require(nBuckets > 0 && numFiles > 0, "nBuckets/numFiles must be positive")
    val spark = vectors.sparkSession
    val bucketed = vectors.withColumn(BucketCol,
        pmod(xxhash64(col(keyCol).cast("string")), lit(nBuckets.toLong)))
      .repartitionByRange(numFiles, col(BucketCol))
      .sortWithinPartitions(BucketCol)
    VersionedStore.overwrite(
      spark.createDataFrame(Seq((keyCol, nBuckets))).toDF("key_col", "n_buckets"),
      metaTable(root))
    VersionedStore.overwrite(bucketed, dataTable(root))
  }

  /** Refresh a published snapshot with new/changed vectors: a keyed
    * MERGE (partial copy-on-write — only files containing updated
    * buckets rewrite), not a republish. Updates are bucketed with the
    * PERSISTED hash config so lookups stay correct; like the IVF
    * inverted file, merge-written files can span buckets and degrade
    * [[pointLookup]]'s file pruning until [[compactSnapshot]].
    */
  def upsertSnapshot(updates: DataFrame, root: String): Long = {
    import graft.offline.VersionedStore
    val spark = updates.sparkSession
    val meta = VersionedStore.read(spark, metaTable(root)).head()
    val keyCol = meta.getString(0)
    val nBuckets = meta.getInt(1)
    VersionedStore.merge(
      updates.withColumn(BucketCol,
        pmod(xxhash64(col(keyCol).cast("string")), lit(nBuckets.toLong))),
      dataTable(root), Seq(keyCol))
  }

  /** Re-sort a published snapshot by bucket to restore ~per-bucket
    * file pruning after accumulated upserts. */
  def compactSnapshot(spark: SparkSession, root: String,
                      numFiles: Int): Long = {
    import graft.offline.VersionedStore
    VersionedStore.compact(spark, dataTable(root), numFiles,
      sortBy = Seq(BucketCol))
  }

  /** Point-read batch multi-get from a [[publishSnapshot]] table: the
    * requested keys' buckets (computed with the same persisted hash
    * config) prune the snapshot read at the FILE level via
    * VersionedStore.readValues, then the usual broadcast semi-join
    * keeps exactly the requested entities. Result contract matches
    * [[batchLookup]] over the published frame.
    */
  def pointLookup(spark: SparkSession, root: String, keys: DataFrame)
  : DataFrame = {
    import graft.offline.VersionedStore
    val meta = VersionedStore.read(spark, metaTable(root)).head()
    val keyCol = meta.getString(0)
    val nBuckets = meta.getInt(1)
    val wanted = keys.select(col(keyCol)).distinct().localCheckpoint()
    val buckets = wanted.select(
        pmod(xxhash64(col(keyCol).cast("string")), lit(nBuckets.toLong))
          .as("b"))
      .distinct().collect().map(_.getLong(0).toDouble).toSeq
    VersionedStore.readValues(spark, dataTable(root), BucketCol, buckets)
      .join(broadcast(wanted), Seq(keyCol))
      .drop(BucketCol)
  }

  /** Batch multi-get with the reference's staleness warnings
    * (OnlineServingService.checkStaleness: any value older than
    * `maxAgeMs` at serve time): assembles vectors straight from the
    * EAV records (the reference's "scalar assembly" path — here the
    * materialization IS scalar assembly, so pre-materialized vs
    * assembled vectors cannot diverge), then flags per-entity how
    * many served slots are stale or default-filled.
    */
  def batchLookupWithWarnings(records: DataFrame, keys: DataFrame,
                              featureNames: Seq[String], default: Double,
                              asOf: String, maxAgeMs: Long): DataFrame = {
    import graft.offline.OfflineStore
    val full = OfflineStore.materializeFull(records, featureNames, default, asOf)
    val stale = featureNames
      .map(f => when(col(s"age_ms_$f") > maxAgeMs, 1L).otherwise(0L))
      .reduce(_ + _)
    val defaults = featureNames
      .map(f => col(s"is_default_$f"))
      .reduce(_ + _)
    batchLookup(full, keys)
      .withColumn("n_stale", stale)
      .withColumn("n_default", defaults)
      .withColumn("warn", col("n_stale") > 0 || col("n_default") > 0)
  }
}
