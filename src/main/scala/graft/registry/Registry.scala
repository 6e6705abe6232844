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

/** One append-only audit record per registry mutation — the
  * reference's FeatureLifecycleEvent (reference src/main/java/.../
  * service/FeatureRegistryService.java:261-273 records an event on
  * every create/update/deprecate). `atMs` is caller-supplied so event
  * time is explicit and replayable, not wall-clock-implicit.
  */
case class LifecycleEvent(objectType: String, name: String, action: String,
                          detail: String, atMs: Long)

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

  // --- lifecycle-audited mutations ------------------------------------
  // Each mutation returns (new state, audit event); the caller appends
  // the event to the AuditLog — registry state stays a pure value.

  def createFeature(features: Dataset[FeatureDef], f: FeatureDef,
                    atMs: Long): (Dataset[FeatureDef], LifecycleEvent) = {
    import features.sparkSession.implicits._
    // Duplicate registration is rejected like the reference's registry
    // (one definition per name). Registry datasets are tiny; the
    // existence check is a deliberate eager action.
    require(features.filter(_.name == f.name).isEmpty,
      s"feature '${f.name}' is already registered")
    (features.unionByName(Seq(f).toDS()),
     LifecycleEvent("feature", f.name, "CREATED",
       s"entity=${f.entity} dtype=${f.dtype}", atMs))
  }

  def deprecateFeatureLogged(features: Dataset[FeatureDef], name: String,
                             atMs: Long)
  : (Dataset[FeatureDef], LifecycleEvent) =
    (deprecateFeature(features, name),
     LifecycleEvent("feature", name, "DEPRECATED", "", atMs))

  def registerViewLogged(name: String, entity: String, version: Int,
                         featureNames: Seq[String], atMs: Long)
  : (FeatureViewDef, LifecycleEvent) = {
    val view = makeView(name, entity, version, featureNames)
    (view, LifecycleEvent("view", name, "REGISTERED",
      s"version=$version schemaHash=${view.schemaHash}", atMs))
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

/** Append-only lifecycle audit log persisted as parquet. Append-mode
  * writes are the storage analogue of the reference's event table —
  * nothing is ever rewritten, so the log is a faithful history.
  */
object AuditLog {
  def append(events: Seq[LifecycleEvent], spark: SparkSession, path: String)
  : Unit = {
    import spark.implicits._
    events.toDS().write.mode("append").parquet(path)
  }

  def read(spark: SparkSession, path: String): Dataset[LifecycleEvent] = {
    import spark.implicits._
    spark.read.parquet(path).as[LifecycleEvent]
  }

  /** The mutation history of one object, in event-time order. */
  def history(spark: SparkSession, path: String, name: String)
  : Dataset[LifecycleEvent] = {
    import spark.implicits._
    read(spark, path).filter(_.name == name)
      .orderBy(col("atMs"))
  }
}
