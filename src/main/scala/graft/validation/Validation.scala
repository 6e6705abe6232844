package graft.validation

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Corpus release gates for [[validateCorpus]]. Max-gates pass when
    * observed <= threshold; lang-coverage min-gates pass when the
    * language's doc fraction >= its configured minimum (a configured
    * language absent from the corpus observes 0 and fails). */
  case class CorpusGates(
    maxExactDupFrac: Double = 0.2,
    maxShortFrac: Double = 0.2,
    minWords: Int = 20,
    maxNullTextFrac: Double = 0.0,
    minLangCoverage: Map[String, Double] = Map.empty)

  /** CORPUS release validation — the LLM-data analog of the feature
    * gate above: one small per-gate report row (gate, observed,
    * threshold, pass) over exact-duplicate fraction, sub-`minWords`
    * fraction (whitespace tokens; NULL text is counted only by the
    * null gate), NULL-text fraction, and per-language doc coverage.
    * The data-card check a corpus ships with, and the promotion gate
    * a refresh pipeline runs before publishing a new version.
    *
    * Scale shape: three map-side-combinable aggregates (corpus
    * counters; two-level distinct-hash count with no Expand; per-lang
    * counts) — each one shuffle of counter rows; gate assembly is
    * unions of one-row frames. Nothing retains per-doc state.
    */
  def validateCorpus(docs: DataFrame, idCol: String, textCol: String,
                     langCol: String, gates: CorpusGates): DataFrame = {
    val base = docs.agg(
      count(lit(1)).as("n"),
      sum(when(col(textCol).isNull, 1L).otherwise(0L)).as("n_null"),
      // null text fails the < comparison into otherwise(0): counted
      // by the null gate, not here
      sum(when(size(split(col(textCol), " ")) < gates.minWords, 1L)
        .otherwise(0L)).as("n_short"))
    val dup = docs.filter(col(textCol).isNotNull)
      .groupBy(md5(col(textCol)).as("h")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_distinct"), sum(col("c")).as("n_nonnull"))
    def row(name: String, observed: Column, threshold: Double,
            pass: Column) = Seq(
      struct(lit(name).as("gate"), observed.as("observed"),
        lit(threshold).as("threshold"), pass.as("pass")))
    val wide = base.crossJoin(broadcast(dup))
    val coreRows = wide.select(explode(array((
      row("exact_dup_frac",
        round(coalesce(lit(1.0) - col("n_distinct") / col("n_nonnull"),
          lit(0.0)), 6),
        gates.maxExactDupFrac,
        round(coalesce(lit(1.0) - col("n_distinct") / col("n_nonnull"),
          lit(0.0)), 6) <= gates.maxExactDupFrac) ++
      row("null_text_frac",
        round(col("n_null") / col("n"), 6), gates.maxNullTextFrac,
        round(col("n_null") / col("n"), 6) <= gates.maxNullTextFrac) ++
      row("short_frac",
        round(col("n_short") / col("n"), 6), gates.maxShortFrac,
        round(col("n_short") / col("n"), 6) <= gates.maxShortFrac)): _*))
      .as("g")).select("g.*")
    if (gates.minLangCoverage.isEmpty) coreRows
    else {
      val spark = docs.sparkSession
      import spark.implicits._
      val wanted = gates.minLangCoverage.toSeq.sorted
        .toDF("lang", "threshold")
      val observedLang = docs.groupBy(col(langCol).as("lang"))
        .agg(count(lit(1)).as("c"))
      val langRows = broadcast(wanted)
        .join(observedLang, Seq("lang"), "left_outer")
        .crossJoin(broadcast(base.select("n")))
        .select(
          concat(lit("lang_coverage:"), col("lang")).as("gate"),
          round(coalesce(col("c"), lit(0L)) / col("n"), 6).as("observed"),
          col("threshold"),
          (round(coalesce(col("c"), lit(0L)) / col("n"), 6)
            >= col("threshold")).as("pass"))
      coreRows.unionByName(langRows)
    }
  }
}
