package graft.offline

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.FeatureEng
import graft.registry.Registry

/** Training-dataset export: the Spark slice of the reference's
  * TrainingExecutionService import/export/preview flow (reference
  * src/main/java/.../service/TrainingExecutionService.java:165-298) —
  * write the train/test artifact with a manifest a consumer can
  * validate against the registry.
  *
  * ONE pass over the data: the deterministic key-hash split column
  * routes rows through `partitionBy("split")` into train=/test=
  * subdirectories, so the export never scans the dataset twice (the
  * two-filtered-writes alternative would). Consumers read one split
  * with partition pruning — the scan lists only that subdirectory.
  */
object TrainingExport {

  case class ExportManifest(schemaHash: Long, columns: Seq[String],
                            keyCol: String, trainPct: Int,
                            trainRows: Long, testRows: Long)

  private val mapper = new ObjectMapper()

  private def dataDir(root: String) = new Path(root, "data").toString

  def exportDataset(df: DataFrame, root: String, keyCol: String,
                    trainPct: Int = 80): ExportManifest = {
    val spark = df.sparkSession
    // 'split' is the artifact's partition column; silently overwriting
    // a user column of that name would destroy data in the export
    require(!df.columns.contains("split"),
      "input already has a 'split' column — rename it before export")
    val withSplit =
      df.withColumn("split", FeatureEng.splitColumn(keyCol, trainPct))
    // Split counts ride the WRITE pass as observed metrics — no second
    // scan of the artifact (count(cond) so an empty split yields 0,
    // where sum(when) would yield null).
    val obs = org.apache.spark.sql.Observation()
    withSplit.observe(obs,
        count(when(col("split") === "train", 1)).as("train_rows"),
        count(when(col("split") === "test", 1)).as("test_rows"))
      .write.mode("overwrite").partitionBy("split")
      .parquet(dataDir(root))
    val counts = obs.get
    val manifest = ExportManifest(
      schemaHash = Registry.schemaHash(df.columns.toSeq.sorted),
      columns = df.columns.toSeq, keyCol = keyCol, trainPct = trainPct,
      trainRows = counts("train_rows").asInstanceOf[Long],
      testRows = counts("test_rows").asInstanceOf[Long])
    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("schemaHash", java.lang.Long.valueOf(manifest.schemaHash))
    m.put("columns", manifest.columns.asJava)
    m.put("keyCol", keyCol)
    m.put("trainPct", java.lang.Integer.valueOf(trainPct))
    m.put("trainRows", java.lang.Long.valueOf(manifest.trainRows))
    m.put("testRows", java.lang.Long.valueOf(manifest.testRows))
    val p = new Path(root, "manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Staged + renamed into place: a concurrent discover()/readManifest
    // sees the previous manifest or this one, never a torn write.
    StorageUtil.atomicOverwrite(fs, p, mapper.writeValueAsBytes(m))
    manifest
  }

  def readManifest(spark: SparkSession, root: String): ExportManifest = {
    val p = new Path(root, "manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = StorageUtil.readAllBytes(fs, p)
    val m = mapper.readValue(bytes, classOf[java.util.Map[String, Object]])
    ExportManifest(
      m.get("schemaHash").toString.toLong,
      m.get("columns").asInstanceOf[java.util.List[String]].asScala.toSeq,
      m.get("keyCol").toString,
      m.get("trainPct").toString.toInt,
      m.get("trainRows").toString.toLong,
      m.get("testRows").toString.toLong)
  }

  /** Read one split with partition pruning (the filter is a partition
    * column, so only that subdirectory is listed and scanned). */
  def readSplit(spark: SparkSession, root: String, split: String)
  : DataFrame =
    spark.read.parquet(dataDir(root)).filter(col("split") === split)

  /** Write a corpus in deterministic SHUFFLED TRAINING ORDER — the
    * materialized form of [[graft.operators.FeatureEng.shuffleShard]]
    * and the last step before a data loader: each row's shard and
    * in-shard position come from the seeded md5 permutation, rows
    * land in `shard=N` subdirectories, and every shard's file is
    * sorted by the shuffle key, so a loader streaming shard files
    * start-to-finish reads the corpus in the epoch's random order.
    * A new seed re-rolls the permutation for the next epoch.
    *
    * ONE pass: `repartition(col("shard"))` puts each shard in exactly
    * one task (hash of the shard VALUE — shards never split), the
    * sort orders it, `partitionBy` routes it to its directory (one
    * file per shard), and the row count rides the write as an
    * observed metric. Size nShards so a shard fits one task — at
    * 100 TB that is ~1 GB shards, the file granularity loaders want.
    */
  def exportShuffled(docs: DataFrame, root: String, keyCol: String,
                     nShards: Int, seed: String = "graft"): Long = {
    require(nShards > 0, "nShards must be positive")
    require(!docs.columns.contains("shard") &&
      !docs.columns.contains("sort_key"),
      "input already has a 'shard'/'sort_key' column — rename before export")
    val spark = docs.sparkSession
    val keyed = docs
      .withColumn("sort_key",
        md5(concat(lit(seed), lit(":"), col(keyCol).cast("string"))))
      .withColumn("shard",
        conv(substring(col("sort_key"), 1, 8), 16, 10).cast("long")
          % 2147483648L % nShards)
    val obs = org.apache.spark.sql.Observation()
    keyed.repartition(col("shard"))
      .sortWithinPartitions("shard", "sort_key")
      .observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(dataDir(root))
    val rows = obs.get("rows").asInstanceOf[Long]
    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("schemaHash", java.lang.Long.valueOf(
      Registry.schemaHash(docs.columns.toSeq.sorted)))
    m.put("columns", docs.columns.toSeq.asJava)
    m.put("keyCol", keyCol)
    m.put("seed", seed)
    m.put("nShards", java.lang.Integer.valueOf(nShards))
    m.put("rows", java.lang.Long.valueOf(rows))
    val p = new Path(root, "shuffle_manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    StorageUtil.atomicOverwrite(fs, p, mapper.writeValueAsBytes(m))
    rows
  }

  /** Read one shard of a shuffled export with partition pruning; rows
    * arrive in the epoch's shuffled order (file sort order). */
  def readShard(spark: SparkSession, root: String, shard: Long): DataFrame =
    spark.read.parquet(dataDir(root)).filter(col("shard") === shard)

  /** Dataset discovery: scan a storage root for exported training
    * datasets and return their manifests as a catalog — the Spark
    * slice of the reference's DatasetDiscoveryService manifest scan
    * (reference src/main/java/.../service/DatasetDiscoveryService
    * .java:25-124). Pure metadata: only `manifest.json` files are
    * opened, never data.
    */
  def discover(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val found =
      if (!fs.exists(rootPath)) Seq.empty
      else fs.listStatus(rootPath).toSeq.filter(_.isDirectory).flatMap { d =>
        val mp = new Path(d.getPath, "manifest.json")
        if (fs.exists(mp))
          Some((d.getPath.toString,
            readManifest(spark, d.getPath.toString)))
        else None
      }
    found.map { case (p, m) =>
      (p, m.schemaHash, m.columns, m.keyCol, m.trainPct, m.trainRows,
        m.testRows)
    }.toDF("path", "schema_hash", "columns", "key_col", "train_pct",
      "train_rows", "test_rows")
  }
}
