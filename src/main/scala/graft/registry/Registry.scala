package graft.registry

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Feature registry — entity / feature / view definitions as typed
  * Datasets persisted to parquet, replacing the reference's PostgreSQL
  * registry (reference src/main/java/.../service/FeatureRegistryService
  * .java). The deterministic schema hash matches the reference
  * algorithm exactly: int(md5(",".join(names))[:8], 16) % 2^31
  * (reference python/gbdt_example/dataset.py:50).
  */
case class EntityDef(name: String, keyColumn: String, description: String)
case class FeatureDef(name: String, entity: String, dtype: String,
                      defaultValue: Double, maxAgeSeconds: Long,
                      active: Boolean = true)
case class FeatureViewDef(name: String, entity: String, version: Int,
                          featureNames: Seq[String], schemaHash: Long)

object Registry {

  /** Driver-side schema hash (same algorithm as Fns.schemaHash). */
  def schemaHash(featureNames: Seq[String]): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(featureNames.mkString(",").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % 2147483648L
  }

  def makeView(name: String, entity: String, version: Int,
               featureNames: Seq[String]): FeatureViewDef =
    FeatureViewDef(name, entity, version, featureNames,
      schemaHash(featureNames))

  def save[T](ds: Dataset[T], path: String): Unit =
    ds.write.mode("overwrite").parquet(path)

  def loadViews(spark: SparkSession, path: String): Dataset[FeatureViewDef] = {
    import spark.implicits._
    spark.read.parquet(path).as[FeatureViewDef]
  }

  def loadFeatures(spark: SparkSession, path: String): Dataset[FeatureDef] = {
    import spark.implicits._
    spark.read.parquet(path).as[FeatureDef]
  }

  /** Soft-delete a feature (the reference's deprecation flow): views
    * referencing it keep working, but new views must not include it.
    */
  def deprecateFeature(features: Dataset[FeatureDef], name: String)
  : Dataset[FeatureDef] = {
    import features.sparkSession.implicits._
    features.map(f => if (f.name == name) f.copy(active = false) else f)
  }

  def activeFeatures(features: Dataset[FeatureDef]): Dataset[FeatureDef] =
    features.filter(_.active)

  /** Distributed schema-hash over EAV records: per entity_type, the
    * sorted distinct feature list and its hash — used to validate a
    * stored dataset against a registered view (the reference's
    * ValidationService schema check).
    */
  def datasetSchemaHash(records: DataFrame): DataFrame =
    records.groupBy("entity_type")
      .agg(array_join(array_sort(collect_set(col("feature_name"))), ",")
        .as("schema_str"))
      .withColumn("schema_hash", Fns.md5Hash31(col("schema_str")))
}
