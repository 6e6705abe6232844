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
