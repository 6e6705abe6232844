package graft.sources

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.offline.VersionedStore

/** Dataset discovery over a corpus root: one descriptor row per
  * direct child directory, classified by storage convention —
  *
  *  - `versioned`: a [[VersionedStore]] table (`_graft_log` present);
  *    latest version, exact committed row count, file count, and
  *    schema come from the MANIFEST — zero data files opened.
  *  - `parquet`: a plain parquet directory; schema from the footers,
  *    optional row count (one metadata-weight Spark count).
  *  - `jsonl` / `csv`: raw text corpora — enumerated with file
  *    counts only; row counts and schemas deliberately stay null
  *    (reading them means a full parse, and the explicit-schema
  *    ingestion policy lives in [[Sources]], not here).
  *  - `empty` / `unknown` otherwise.
  *
  * A child carrying a `dataset_manifest.json` additionally gets its
  * declared id/description and the raw manifest JSON in the row —
  * the registration convention of the reference's dataset discovery
  * (DatasetDiscoveryService.java:74-124: scan a root for manifest
  * files, parse descriptors, stable order, tolerate malformed
  * manifests). Malformed manifests follow the [[Sources]] quarantine
  * policy: the row is KEPT with `manifest_error` set, never silently
  * dropped. Rows come back sorted by dataset_id.
  *
  * Scale shape: discovery is a driver-side directory listing plus
  * manifest reads (both O(datasets), like any catalog refresh) — the
  * 100 TB of data below the directories is never touched unless
  * `countRows` asks for parquet row counts.
  */
object Catalog {

  final case class DatasetDescriptor(
      dataset_id: String, name: String, path: String, kind: String,
      latest_version: Long, n_files: Long, est_rows: Long,
      schema_json: Option[String], description: Option[String],
      manifest_json: Option[String], manifest_error: Option[String])

  val ManifestName = "dataset_manifest.json"
  private val mapper = new ObjectMapper()

  /** Scan `basePath`'s direct children into descriptor rows. */
  def discover(spark: SparkSession, basePath: String,
               countRows: Boolean = false): DataFrame = {
    import spark.implicits._
    val base = new Path(basePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(base), s"catalog base path does not exist: $basePath")
    val dirs = fs.listStatus(base).filter(_.isDirectory).map(_.getPath)
    val rows = dirs.toSeq.map(describeDir(spark, fs, _, countRows))
      .sortBy(_.dataset_id)
    rows.toDF()
  }

  private def describeDir(spark: SparkSession,
                          fs: org.apache.hadoop.fs.FileSystem,
                          dir: Path, countRows: Boolean)
  : DatasetDescriptor = {
    val name = dir.getName
    val children = fs.listStatus(dir)
    val fileNames = children.filter(_.isFile).map(_.getPath.getName)
    def count(suffix: String) =
      fileNames.count(n => n.endsWith(suffix) && !n.startsWith(".") &&
        !n.startsWith("_") && n != ManifestName)

    // optional registration manifest (id/description/params)
    val manifestPath = new Path(dir, ManifestName)
    val (mJson, mId, mDesc, mErr) =
      if (!fs.exists(manifestPath)) (None, None, None, None)
      else {
        val in = fs.open(manifestPath)
        val raw = try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
          new String(out.toByteArray, "UTF-8")
        } finally in.close()
        try {
          val node = mapper.readTree(raw)
          (Some(raw),
            Option(node.get("id")).map(_.asText()),
            Option(node.get("description")).map(_.asText()),
            None)
        } catch {
          case NonFatal(e) =>
            (Some(raw), None, None,
              Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
      }

    val desc =
      if (VersionedStore.latestVersion(spark, dir.toString) >= 0L) {
        val infos = VersionedStore.versions(spark, dir.toString)
        val head = infos.last
        DatasetDescriptor(name, name, dir.toString, "versioned",
          head.version, head.nFiles.toLong, head.rows,
          Some(VersionedStore.schemaOf(spark, dir.toString).json),
          None, None, None)
      } else if (count(".parquet") > 0) {
        val df = spark.read.parquet(dir.toString)
        val est = if (countRows) df.count() else -1L
        DatasetDescriptor(name, name, dir.toString, "parquet",
          -1L, count(".parquet").toLong, est,
          Some(df.schema.json), None, None, None)
      } else if (count(".jsonl") + count(".json") > 0) {
        DatasetDescriptor(name, name, dir.toString, "jsonl",
          -1L, (count(".jsonl") + count(".json")).toLong, -1L,
          None, None, None, None)
      } else if (count(".csv") > 0) {
        DatasetDescriptor(name, name, dir.toString, "csv",
          -1L, count(".csv").toLong, -1L, None, None, None, None)
      } else if (children.isEmpty) {
        DatasetDescriptor(name, name, dir.toString, "empty",
          -1L, 0L, -1L, None, None, None, None)
      } else {
        DatasetDescriptor(name, name, dir.toString, "unknown",
          -1L, fileNames.length.toLong, -1L, None, None, None, None)
      }

    desc.copy(
      dataset_id = mId.getOrElse(desc.dataset_id),
      description = mDesc,
      manifest_json = mJson,
      manifest_error = mErr)
  }
}
