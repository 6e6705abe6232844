package graft.validation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.offline.OfflineStore
import graft.registry.{FeatureViewDef, Registry}

/** Dataset validation against a registered feature view — the Spark
  * re-expression of the reference's ValidationService
  * (reference src/main/java/.../service/ValidationService.java):
  * schema-hash match, vector-length check, per-feature staleness vs
  * max-age SLA, default-fill rate, and a boolean gate.
  *
  * One aggregation pass over the latest snapshot (itself a map-side
  * combining aggregate) → a single small report row per view; nothing
  * here scales with raw record count except that snapshot pass.
  */
object Validation {

  /** One-row validation report for `view` over EAV records. */
  def validateView(records: DataFrame, view: FeatureViewDef, asOf: String,
                   slaMs: Map[String, Long],
                   maxDefaultFillRate: Double = 0.5): DataFrame = {
    val inView = records.filter(col("feature_name").isin(view.featureNames: _*))
    val latest = OfflineStore.latestSnapshot(inView)
    // Same SLA semantics as OfflineStore.staleness: no configured SLA
    // means the feature is exempt (never counted stale).
    val slaExpr = slaMs.foldLeft(lit(null).cast("long")) { case (acc, (f, ms)) =>
      when(col("feature_name") === f, ms).otherwise(acc)
    }
    val asOfMs = unix_millis(lit(asOf).cast("timestamp"))

    val perEntity = latest.groupBy("entity_id")
      .agg(
        count(lit(1)).as("n_present"),
        sum(when(slaExpr.isNotNull &&
            asOfMs - unix_millis(col("event_time")) > slaExpr, 1L)
          .otherwise(0L)).as("n_stale"))

    val expectedLen = view.featureNames.size
    // datasetSchemaHash canonicalizes by SORTING distinct names (the
    // stored data has no inherent feature order), so the expected hash
    // must be over the sorted declared list too. The view's identity
    // hash (declared order, view.schemaHash) is reported separately.
    val expectedSetHash = Registry.schemaHash(view.featureNames.sorted)
    val actualHash = Registry.datasetSchemaHash(
      inView.withColumn("entity_type", lit(view.entity)))
      .select("schema_hash")

    val agg = perEntity.agg(
      count(lit(1)).as("n_entities"),
      sum(col("n_present")).as("n_values"),
      sum(lit(expectedLen.toLong) - col("n_present")).as("n_defaults"),
      sum(col("n_stale")).as("n_stale"))

    agg.crossJoin(broadcast(actualHash))
      .select(
        lit(view.name).as("view_name"),
        lit(view.version).as("view_version"),
        lit(expectedSetHash).as("schema_hash_expected"),
        col("schema_hash").as("schema_hash_actual"),
        (col("schema_hash") === expectedSetHash).as("schema_ok"),
        lit(expectedLen).as("vector_length"),
        col("n_entities"),
        round(col("n_defaults") / (col("n_entities") * expectedLen), 6)
          .as("default_fill_rate"),
        round(col("n_stale") / (col("n_entities") * expectedLen), 6)
          .as("stale_rate"))
      .withColumn("validation_pass",
        col("schema_ok") && col("default_fill_rate") <= maxDefaultFillRate)
  }

  /** Model-metric gate (the reference's promotion check): every metric
    * at-or-above its threshold. Driver-side — metrics are tiny.
    */
  def metricGate(metrics: Map[String, Double],
                 thresholds: Map[String, Double]): Boolean =
    thresholds.forall { case (k, min) => metrics.get(k).exists(_ >= min) }
}
