package graft.offline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline feature store over EAV feature records
  * (entity_id, feature_name, value_float, event_time, commit_id) —
  * the Spark re-expression of the reference's Iceberg offline store
  * (reference src/main/java/.../store/offline/IcebergOfflineStore.java).
  *
  * Persisted layout (see write): partitioned by (entity_type,
  * event_date) exactly like the reference's PartitionSpec
  * (IcebergOfflineStore.java:55-58) so time-window queries prune
  * partitions and entity_type scans never touch other entities.
  */
object OfflineStore {

  /** Write records partitioned for 100 TB pruning. */
  def write(records: DataFrame, path: String): Unit =
    records
      .withColumn("event_date", to_date(col("event_time")))
      .repartition(col("entity_type"), col("event_date"))
      .sortWithinPartitions("entity_id", "event_time")
      .write.mode("overwrite")
      .partitionBy("entity_type", "event_date")
      .parquet(path)

  /** Latest record per (entity, feature): the online-store snapshot.
    * Ties broken by commit_id (arrival order) — deterministic because
    * commit_id is unique per key.
    *
    * Implemented as a max_by hash AGGREGATE, not a row_number window:
    * partial aggregation collapses each map partition to one row per
    * key BEFORE the shuffle, so at 100 TB the exchange carries
    * O(distinct keys), not O(records) — and no per-partition sort.
    */
  def latestSnapshot(records: DataFrame, asOfCommit: Long = Long.MaxValue)
  : DataFrame = {
    val ordKey = struct(col("event_time"), col("commit_id"))
    val cols = records.columns.toIndexedSeq
    val payload = struct(cols.map(col): _*)
    records
      .filter(col("commit_id") <= asOfCommit)
      .groupBy("entity_id", "feature_name")
      .agg(max_by(payload, ordKey).as("r"))
      .select(cols.map(c => col(s"r.$c")): _*)
  }

  /** Materialize fixed-schema feature vectors: latest scalar per
    * feature pivoted to wide columns in schema order, missing features
    * default-filled, with an n_default count (the reference's
    * is_default_mask, MaterializationService.java + proto FeatureVector).
    * Conditional aggregation (not .pivot) so no value-discovery pass.
    */
  def materializeVectors(records: DataFrame, featureNames: Seq[String],
                         default: Double): DataFrame = {
    // ONE shuffle on entity_id: per-feature latest via max_by with a
    // conditional ordering key (null ordering keys are ignored by
    // max_by, so each aggregate only sees its own feature's rows) —
    // no (entity, feature) pre-shuffle, partial aggregation intact.
    val valueCols = featureNames.map { f =>
      max_by(
        when(col("feature_name") === f, col("value_float")),
        when(col("feature_name") === f,
          struct(col("event_time"), col("commit_id")))).as(s"raw_$f")
    }
    val grouped = records.groupBy("entity_id")
      .agg(valueCols.head, valueCols.tail: _*)
    val nDefault = featureNames
      .map(f => when(col(s"raw_$f").isNull, 1).otherwise(0))
      .reduce((a, b) => a + b)
    grouped.select(
      Seq(col("entity_id")) ++
      featureNames.map(f => coalesce(col(s"raw_$f"), lit(default)).as(s"f_$f")) ++
      Seq(nDefault.as("n_default")): _*)
  }

  /** Incremental snapshot refresh: fold a delta of new EAV records
    * into an existing snapshot. Union + latest keeps the merge
    * idempotent and order-insensitive (same max_by tie-break), so
    * replayed or out-of-order deltas cannot regress the snapshot —
    * the batch analogue of StreamingMaterialize.latestSnapshot.
    * Cost scales with |snapshot| + |delta|, not history.
    */
  def mergeSnapshot(snapshot: DataFrame, delta: DataFrame): DataFrame =
    latestSnapshot(snapshot.unionByName(delta))

  /** Full-fidelity vector materialization matching the reference's
    * FeatureVector proto fields (reference src/main/proto/
    * feature_store.proto:61-62): per slot the value, is_default flag,
    * and value_age_ms at serve time (-1 for default-filled slots).
    * Same single-aggregate shape as materializeVectors.
    */
  def materializeFull(records: DataFrame, featureNames: Seq[String],
                      default: Double, asOf: String): DataFrame = {
    // Same single-shuffle max_by shape as materializeVectors.
    val asOfMs = unix_millis(lit(asOf).cast("timestamp"))
    val aggs = featureNames.flatMap { f =>
      val ord = when(col("feature_name") === f,
        struct(col("event_time"), col("commit_id")))
      Seq(
        max_by(when(col("feature_name") === f, col("value_float")), ord)
          .as(s"raw_$f"),
        max(when(col("feature_name") === f, unix_millis(col("event_time"))))
          .as(s"ts_$f"))
    }
    val grouped = records.groupBy("entity_id").agg(aggs.head, aggs.tail: _*)
    grouped.select(
      col("entity_id") +:
      featureNames.flatMap { f =>
        Seq(
          coalesce(col(s"raw_$f"), lit(default)).as(s"f_$f"),
          when(col(s"raw_$f").isNull, 1L).otherwise(0L).as(s"is_default_$f"),
          when(col(s"raw_$f").isNotNull, asOfMs - col(s"ts_$f"))
            .otherwise(lit(-1L)).as(s"age_ms_$f"))
      }: _*)
  }

  /** Staleness validation vs per-feature max-age SLA (the reference's
    * ValidationService.validateStaleness): age of the latest value of
    * each (entity, feature) at `asOf`, flagged fresh/stale.
    *
    * SLA semantics (shared with Validation.validateView): a feature
    * with NO configured SLA is exempt — it can never be stale, so
    * `fresh` is 1 and `sla_ms` is null.
    */
  def staleness(records: DataFrame, asOf: String,
                slaMs: Map[String, Long]): DataFrame = {
    val slaExpr = slaMs.foldLeft(lit(null).cast("long")) {
      case (acc, (f, ms)) => when(col("feature_name") === f, ms).otherwise(acc)
    }
    latestSnapshot(records)
      .withColumn("age_ms",
        unix_millis(lit(asOf).cast("timestamp")) - unix_millis(col("event_time")))
      .withColumn("sla_ms", slaExpr)
      .withColumn("fresh",
        when(col("sla_ms").isNull || col("age_ms") <= col("sla_ms"), 1)
          .otherwise(0))
      .select("entity_id", "feature_name", "age_ms", "sla_ms", "fresh")
  }

  /** Bitemporal time travel: the snapshot as it existed when commit
    * `asOfCommit` landed (arrival time), still ordered by event time.
    */
  def timeTravel(records: DataFrame, asOfCommit: Long): DataFrame =
    latestSnapshot(records, asOfCommit)

  /** Distribution drift between two event-time windows per feature:
    * means/stddevs + a normalized drift score.
    */
  def drift(records: DataFrame, aStart: String, mid: String, bEnd: String)
  : DataFrame = {
    import graft.operators.WindowedFeatures.dsum
    val ts = col("event_time")
    val inA = ts >= lit(aStart).cast("timestamp") && ts < lit(mid).cast("timestamp")
    val inB = ts >= lit(mid).cast("timestamp") && ts < lit(bEnd).cast("timestamp")
    records
      .filter(inA || inB)
      .groupBy("feature_name")
      .agg(
        count(when(inA, 1)).as("count_a"),
        count(when(inB, 1)).as("count_b"),
        round(dsum(when(inA, col("value_float"))) / count(when(inA, 1)), 6)
          .as("mean_a"),
        round(dsum(when(inB, col("value_float"))) / count(when(inB, 1)), 6)
          .as("mean_b"),
        round(stddev(when(inA, col("value_float"))), 4).as("std_a"),
        round(stddev(when(inB, col("value_float"))), 4).as("std_b"))
      .withColumn("drift_score",
        round(abs(col("mean_b") - col("mean_a")) / (col("std_a") + 1.0), 6))
  }
}
