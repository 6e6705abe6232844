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
}
