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

  /** Idempotently map the `.zst` extension to [[ZstdCodec]] in the
    * session's Hadoop configuration, so every text-based read
    * (jsonl/csv, quarantined or strict) decodes `.jsonl.zst` /
    * `.csv.zst` shards transparently — `.gz` already works through
    * the stock (pure-Java-capable) GzipCodec. Setting
    * `io.compression.codecs` REPLACES the ServiceLoader-discovered
    * list, so the stock codecs are re-listed explicitly alongside
    * ours. Every reader below calls this; it is also public for
    * direct spark.read users. */
  def registerCompressionCodecs(spark: SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val ours = classOf[ZstdCodec].getName
    val cur = conf.get("io.compression.codecs", "")
    if (!cur.contains(ours)) {
      val stock = Seq(
        "org.apache.hadoop.io.compress.DefaultCodec",
        "org.apache.hadoop.io.compress.GzipCodec",
        "org.apache.hadoop.io.compress.BZip2Codec",
        "org.apache.hadoop.io.compress.DeflateCodec",
        "org.apache.hadoop.io.compress.Lz4Codec")
      val base = if (cur.isEmpty) stock else cur.split(",").toSeq
      conf.set("io.compression.codecs", (base :+ ours).mkString(","))
    }
  }

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
                           schema: StructType): (DataFrame, DataFrame) = {
    registerCompressionCodecs(spark)
    quarantined(schema, s => spark.read
      .schema(s)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path))
  }

  /** Read a JSONL corpus, aborting on the first malformed line — the
    * ingestion-gate mode. */
  def readJsonlStrict(spark: SparkSession, path: String,
                      schema: StructType): DataFrame = {
    registerCompressionCodecs(spark)
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)
  }

  /** Read a CSV sidecar (header expected, schema explicit), same
    * quarantine split as JSONL. `enforceSchema` is OFF: the file's
    * header NAMES are validated against the schema instead of being
    * skipped positionally — a reordered or renamed header fails
    * loudly rather than silently mismapping same-typed columns. */
  def readCsvQuarantined(spark: SparkSession, path: String,
                         schema: StructType): (DataFrame, DataFrame) = {
    registerCompressionCodecs(spark)
    quarantined(schema, s => spark.read
      .schema(s)
      .option("header", "true")
      .option("enforceSchema", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path))
  }

  /** Export as JSONL (one document per line) — the interchange format
    * downstream tokenizer/training jobs read. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Export as zstd-compressed JSONL shards — the wire format big
    * public corpora distribute in. One frame per file (see
    * [[ZstdCodec]]): parallelism on the read side comes from the
    * shard count, so partition the frame to the shard layout you
    * want before writing. */
  def writeJsonlZst(df: DataFrame, path: String): Unit = {
    registerCompressionCodecs(df.sparkSession)
    df.write.mode("overwrite")
      .option("compression", classOf[ZstdCodec].getName).json(path)
  }
}
