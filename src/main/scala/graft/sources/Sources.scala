package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Corpus ingestion for the training-data pipeline. Raw LLM corpora
  * arrive as JSONL (one document per line — the Dolma/Pile/CC
  * interchange format), CSV sidecars, or parquet; ingestion at 100 TB
  * means malformed lines are a CERTAINTY, so every reader takes an
  * explicit malformed-input policy instead of inheriting Spark's
  * silent default:
  *  - quarantine (default): parse PERMISSIVE, split the result into
  *    (clean, corrupt) so bad lines are retained for inspection and
  *    the clean side flows on — corruption never silently drops data
  *    OR poisons downstream operators with half-parsed rows;
  *  - failfast: any malformed line aborts the read — the ingestion-
  *    gate mode.
  * Schemas are explicit, never inferred: inference costs an extra full
  * pass at scale and lets a schema drift land silently.
  */
object Sources {

  private val CorruptCol = "_corrupt_record"

  /** The shared quarantine split: parse PERMISSIVE with a corrupt-
    * record column, materialize once (Spark cannot filter on the
    * corrupt column of an un-materialized scan — SPARK-26228 — and
    * one lazy checkpoint also means the file parses once, not once
    * per side), then split into (clean, corrupt). */
  private def quarantined(schema: StructType,
                          parse: StructType => DataFrame)
  : (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — the reader adds it")
    val withCorrupt = schema.add(CorruptCol, StringType, nullable = true)
    val parsed = parse(withCorrupt).localCheckpoint(false)
    val clean = parsed.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val corrupt = parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, corrupt)
  }

  /** Read a JSONL corpus and split it into (clean, corrupt): clean
    * rows carry `schema`'s columns, corrupt rows the raw offending
    * line. */
  def readJsonlQuarantined(spark: SparkSession, path: String,
                           schema: StructType): (DataFrame, DataFrame) =
    quarantined(schema, s => spark.read
      .schema(s)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path))

  /** Read a JSONL corpus, aborting on the first malformed line — the
    * ingestion-gate mode. */
  def readJsonlStrict(spark: SparkSession, path: String,
                      schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Read a CSV sidecar (header expected, schema explicit), same
    * quarantine split as JSONL. `enforceSchema` is OFF: the file's
    * header NAMES are validated against the schema instead of being
    * skipped positionally — a reordered or renamed header fails
    * loudly rather than silently mismapping same-typed columns. */
  def readCsvQuarantined(spark: SparkSession, path: String,
                         schema: StructType): (DataFrame, DataFrame) =
    quarantined(schema, s => spark.read
      .schema(s)
      .option("header", "true")
      .option("enforceSchema", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path))

  /** Export as JSONL (one document per line) — the interchange format
    * downstream tokenizer/training jobs read. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
