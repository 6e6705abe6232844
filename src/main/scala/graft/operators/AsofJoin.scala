package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (ASOF) join: for each label event, the latest value of
  * each feature at-or-before the label's event time.
  *
  * Re-expresses the reference's
  * IcebergOfflineStore.generateTrainingDataset (reference
  * src/main/java/.../store/offline/IcebergOfflineStore.java:118-200),
  * which builds a driver-side TreeMap per (entity, feature) and calls
  * floorEntry per label — single-node, O(history) driver memory.
  *
  * Spark-first design: UNION the label stream into the feature stream,
  * then one window pass per entity ordered by (ts, kind, seq) taking
  * `last(value, ignoreNulls)` per feature column. One shuffle on the
  * entity key, no label×history join blowup, streaming-friendly sort
  * within partitions — this survives 100 TB because each entity's
  * history is processed once, and the lookback filter prunes
  * event_time partitions before the shuffle.
  */
object AsofJoin {

  /** @param features EAV rows (entityCol, tsCol, nameCol, valueCol)
    * @param labels   label rows (entityCol, tsCol, labelIdCol, labelCol)
    * @param featureNames fixed, ordered feature list (the view schema)
    * @param default  value used when no feature row precedes the label
    * @param labelWindowStart when the caller knows the earliest label
    *   time, pass it to prune feature history with a constant the scan
    *   can push down. When None, the bound is derived LAZILY from a
    *   broadcast single-row min — no job runs until the plan executes,
    *   honoring the facade's "nothing executes until an action"
    *   contract (at the cost of pruning post-scan instead of at the
    *   parquet reader).
    */
  def pointInTime(features: DataFrame, labels: DataFrame,
                  entityCol: String, tsCol: String, nameCol: String,
                  valueCol: String, labelIdCol: String, labelCol: String,
                  featureNames: Seq[String], default: Double,
                  lookbackDays: Int = 180,
                  labelWindowStart: Option[java.sql.Timestamp] = None)
  : DataFrame = {
    val lookback = expr(s"INTERVAL $lookbackDays DAYS")
    val pruned = labelWindowStart match {
      case Some(start) =>
        features.filter(col(tsCol) >= lit(start) - lookback)
      case None =>
        val minTs = labels.agg(min(col(tsCol)).as("__min_label_ts"))
        features.crossJoin(broadcast(minTs))
          .filter(col(tsCol) >= col("__min_label_ts") - lookback)
          .drop("__min_label_ts")
    }
    val featSide = pruned
      .filter(col(nameCol).isin(featureNames: _*)) // prune non-view features at scan
      .select(
        col(entityCol).as("entity_id"), col(tsCol).as("ts"),
        lit(0).as("kind"), lit(-1L).as("label_id"),
        lit(null).cast("double").as("label"),
        col(nameCol).as("fname"), col(valueCol).as("fval"))
    val labelSide = labels.select(
      col(entityCol).as("entity_id"), col(tsCol).as("ts"),
      lit(1).as("kind"), col(labelIdCol).cast("long").as("label_id"),
      col(labelCol).cast("double").as("label"),
      lit(null).cast("string").as("fname"),
      lit(null).cast("double").as("fval"))

    val unioned = featSide.unionByName(labelSide)
    // Feature rows sort before label rows at equal ts (kind 0 < 1), so a
    // feature stamped exactly at the label time IS visible — matching the
    // reference's floorEntry (<=) semantics. fname/fval complete the
    // ordering so equal-timestamp duplicate feature rows resolve
    // deterministically (greatest value wins) on any cluster layout.
    val w = Window.partitionBy("entity_id")
      .orderBy(col("ts"), col("kind"), col("label_id"),
               col("fname"), col("fval"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = featureNames.foldLeft(unioned) { (df, f) =>
      df.withColumn(s"f_$f",
        last(when(col("fname") === f, col("fval")), ignoreNulls = true)
          .over(w))
    }
    val outCols =
      Seq(col("entity_id"), col("label_id"), col("label")) ++
      featureNames.map(f =>
        coalesce(col(s"f_$f"), lit(default)).as(s"f_$f"))
    withAsof.filter(col("kind") === 1).select(outCols: _*)
  }
}
