package graft.offline

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet table with storage-level time travel — the
  * Spark-native analogue of the reference's Iceberg snapshot store
  * (reference src/main/java/.../store/offline/IcebergOfflineStore
  * .java:42-59: every write commits a snapshot, historical reads open
  * a snapshot by id), built from public parts only: immutable parquet
  * data files plus an append-only JSON commit log of file manifests.
  *
  * Layout:
  * {{{
  *   <root>/_graft_log/v00000042.json      one manifest per version
  *   <root>/data/<uuid>/part-*.parquet     immutable data files
  * }}}
  *
  * Scale properties:
  *  - A manifest lists EVERY file in its snapshot, so reading version
  *    v opens exactly those files — O(|snapshot|), never O(|history|);
  *    no filter over a commit column, no tombstone reconciliation.
  *  - Commits are optimistic: the manifest is created with
  *    `create(overwrite = false)` (atomic on HDFS and local file
  *    systems), so concurrent writers race on the version number and
  *    the loser retries against the new head. Readers see a complete
  *    manifest or none — snapshot isolation by construction.
  *  - Data files are immutable; `merge` is copy-on-write over the
  *    current snapshot. (A production refinement would rewrite only
  *    the files whose key ranges intersect the updates, driven by
  *    per-file min/max stats in the manifest.)
  */
/** Shared manifest-file plumbing for the offline stores. */
private[offline] object StorageUtil {
  def readAllBytes(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      out.toByteArray
    } finally in.close()
  }

  /** Atomically publish `bytes` at `path`, REPLACING any existing file
    * (last-writer-wins — for metadata like an export manifest that is
    * regenerated whole on every write). A direct `fs.create(p, true)`
    * truncates first, so a concurrent reader can observe an empty or
    * partial file; here the content is staged to a sibling temp file
    * and moved into place, so readers see the old manifest or the new
    * one, never a torn write.
    */
  def atomicOverwrite(fs: FileSystem, path: Path,
                      bytes: Array[Byte]): Unit =
    if (fs.getScheme == "file") {
      val target = java.nio.file.Paths.get(path.toUri.getPath)
      java.nio.file.Files.createDirectories(target.getParent)
      val tmp = java.nio.file.Files.createTempFile(
        target.getParent, s".${target.getFileName}_", ".tmp")
      try {
        java.nio.file.Files.write(tmp, bytes)
        java.nio.file.Files.move(tmp, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      // HDFS-style: stage, then rename over the target. Plain
      // FileSystem.rename refuses an existing destination, so go
      // through FileContext with Rename.OVERWRITE (atomic on HDFS).
      val tmp = new Path(path.getParent,
        s".${path.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val out = fs.create(tmp, true)
      try { out.write(bytes) } finally out.close()
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          path.toUri, fs.getConf)
        fc.rename(tmp, path, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        case e: Throwable => fs.delete(tmp, false); throw e
      }
    }
}

object VersionedStore {

  case class VersionInfo(version: Long, op: String, nFiles: Int, rows: Long)

  private val mapper = new ObjectMapper()

  private def fileSystem(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(root: String) = new Path(root, "_graft_log")

  private def manifestPath(root: String, v: Long) =
    new Path(logDir(root), f"v$v%08d.json")

  /** Highest committed version, or -1 for a non-existent table. */
  def latestVersion(spark: SparkSession, root: String): Long = {
    val dir = logDir(root)
    val fs = fileSystem(spark, dir)
    if (!fs.exists(dir)) -1L
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .foldLeft(-1L)(math.max)
  }

  private def readManifest(spark: SparkSession, root: String, v: Long)
  : (String, Seq[String], Long) = {
    val p = manifestPath(root, v)
    val fs = fileSystem(spark, p)
    require(fs.exists(p), s"version $v does not exist under $root")
    val bytes = StorageUtil.readAllBytes(fs, p)
    val m = mapper.readValue(bytes, classOf[java.util.Map[String, Object]])
    val files = m.get("files").asInstanceOf[java.util.List[String]]
      .asScala.toSeq
    (m.get("op").toString, files, m.get("rows").toString.toLong)
  }

  /** Read a snapshot: the latest version, or `versionAsOf` — opening
    * ONLY that manifest's files.
    */
  def read(spark: SparkSession, root: String, versionAsOf: Long = -1L)
  : DataFrame = {
    val v = if (versionAsOf >= 0) versionAsOf else latestVersion(spark, root)
    require(v >= 0, s"no committed version under $root")
    val (_, files, _) = readManifest(spark, root, v)
    require(files.nonEmpty, s"version $v of $root is an empty snapshot")
    spark.read.parquet(files.map(f => new Path(root, f).toString): _*)
  }

  def versions(spark: SparkSession, root: String): Seq[VersionInfo] =
    (0L to latestVersion(spark, root)).map { v =>
      val (op, files, rows) = readManifest(spark, root, v)
      VersionInfo(v, op, files.size, rows)
    }

  /** Race lost on an expected version number — the caller must re-read
    * the head and recompute before retrying. */
  class CommitConflict(msg: String)
    extends java.util.ConcurrentModificationException(msg)

  // Only an existence conflict on the manifest means "lost the race";
  // anything else (permissions, disk) must surface as-is. Both claim
  // sites in atomicCreate throw a TYPED already-exists exception
  // (Files.createLink on file://, an explicit hadoop
  // FileAlreadyExistsException on the rename path), so no message
  // sniffing: an unrelated IOException must not be silently retried.
  private def isVersionConflict(e: Throwable): Boolean = e match {
    case _: org.apache.hadoop.fs.FileAlreadyExistsException => true
    case _: java.nio.file.FileAlreadyExistsException => true
    case _ => false
  }

  /** Atomically publish `bytes` at `path`, failing if it exists.
    * Hadoop's create(overwrite = false) is atomic on HDFS but an
    * exists-then-truncate TOCTOU on LocalFileSystem, so on file://
    * the claim is a hard link instead: content is staged to a temp
    * file and linked into place — link creation is O_EXCL-atomic on
    * POSIX, and the manifest is never visible partially written.
    */
  private def atomicCreate(fs: FileSystem, path: Path,
                           bytes: Array[Byte]): Unit =
    if (fs.getScheme == "file") {
      val target = java.nio.file.Paths.get(path.toUri.getPath)
      java.nio.file.Files.createDirectories(target.getParent)
      val tmp = java.nio.file.Files.createTempFile(
        target.getParent, ".manifest_", ".tmp")
      try {
        java.nio.file.Files.write(tmp, bytes)
        java.nio.file.Files.createLink(target, tmp) // throws FileAlreadyExists
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      // A direct create() would be LISTABLE before its bytes land —
      // readers could parse a truncated manifest. Stage the full
      // content, then rename: atomic on HDFS, and rename FAILS when
      // the target exists, which doubles as the version-claim check.
      val tmp = new Path(path.getParent,
        s".${path.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      if (!fs.rename(tmp, path)) {
        fs.delete(tmp, false)
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(
          path.toString)
      }
    }

  /** Commit `df` as a new version. `carryPrev` keeps the previous
    * snapshot's files in the new manifest (append semantics). When
    * `expectedVersion` >= 0 the commit claims EXACTLY that version or
    * throws CommitConflict — required whenever the content was derived
    * from a snapshot read (create/merge), because blindly re-claiming
    * the next number would publish stale content over a racing
    * writer's commit. Append/overwrite content is head-independent
    * (append re-reads the head's file list on every attempt), so those
    * retry internally. Returns the committed version number.
    */
  private def commit(df: DataFrame, root: String, op: String,
                     carryPrev: Boolean, expectedVersion: Long = -1L): Long = {
    val spark = df.sparkSession
    val uuid = java.util.UUID.randomUUID().toString.take(12)
    val dataRel = s"data/$uuid"
    val dataDir = new Path(root, dataRel)
    df.write.parquet(dataDir.toString)
    val fs = fileSystem(spark, dataDir)
    val newFiles = fs.listStatus(dataDir).map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .sorted.map(n => s"$dataRel/$n").toSeq
    // Footer-driven count: parquet count(*) never deserializes rows.
    val newRows = spark.read.parquet(dataDir.toString).count()
    fs.mkdirs(logDir(root))
    var attempt = 0
    var lastConflict: Throwable = null
    while (attempt < 10) {
      val prev = latestVersion(spark, root)
      val (files, rows) =
        if (carryPrev && prev >= 0) {
          val (_, prevFiles, prevRows) = readManifest(spark, root, prev)
          (prevFiles ++ newFiles, prevRows + newRows)
        } else (newFiles, newRows)
      val next = if (expectedVersion >= 0) expectedVersion else prev + 1
      val manifest = new java.util.LinkedHashMap[String, Object]()
      manifest.put("version", java.lang.Long.valueOf(next))
      manifest.put("op", op)
      manifest.put("files", files.asJava)
      manifest.put("rows", java.lang.Long.valueOf(rows))
      manifest.put("schema", df.schema.json)
      try {
        atomicCreate(fs, manifestPath(root, next),
          mapper.writeValueAsBytes(manifest))
        return next
      } catch {
        case e if isVersionConflict(e) =>
          if (expectedVersion >= 0) {
            // the staged snapshot will never be referenced — reclaim it
            fs.delete(dataDir, true)
            val c = new CommitConflict(
              s"version $expectedVersion of $root was claimed concurrently")
            c.initCause(e)
            throw c
          }
          lastConflict = e
          attempt += 1 // content is head-independent; re-read and retry
      }
    }
    fs.delete(dataDir, true) // unreferenced after exhausting retries
    throw new IllegalStateException(
      s"could not commit to $root after 10 attempts (concurrent writers)",
      lastConflict)
  }

  /** Create version 0 of a new table (atomic: a racing create loses
    * with CommitConflict rather than stacking a version on top). */
  def create(df: DataFrame, root: String): Long = {
    require(latestVersion(df.sparkSession, root) < 0,
      s"$root already exists — use append/overwrite/merge")
    commit(df, root, "create", carryPrev = false, expectedVersion = 0L)
  }

  /** Append-only commit: new files join the previous snapshot. */
  def append(df: DataFrame, root: String): Long =
    commit(df, root, "append", carryPrev = true)

  /** Replace the snapshot (previous versions stay readable). */
  def overwrite(df: DataFrame, root: String): Long =
    commit(df, root, "overwrite", carryPrev = false)

  /** MERGE (upsert) by key: rows in `updates` replace current rows
    * with the same key tuple; unmatched update rows are inserted.
    * Copy-on-write: the surviving current rows and the updates are
    * written as a fresh snapshot, so every earlier version is
    * untouched and still readable.
    *
    * Optimistic concurrency done right: the merged content is bound to
    * the head it was computed from (commit claims exactly head+1); if
    * a racing writer lands first, the merge is RECOMPUTED against the
    * new head instead of publishing stale content over it.
    */
  def merge(updates: DataFrame, root: String, keys: Seq[String]): Long = {
    val spark = updates.sparkSession
    var attempt = 0
    while (attempt < 10) {
      val head = latestVersion(spark, root)
      require(head >= 0, s"no committed version under $root")
      val current = read(spark, root, head)
      val merged = current.join(updates.select(keys.map(
          org.apache.spark.sql.functions.col): _*).distinct(), keys, "left_anti")
        .unionByName(updates)
      try {
        return commit(merged, root, "merge", carryPrev = false,
          expectedVersion = head + 1)
      } catch {
        case _: CommitConflict => attempt += 1 // recompute vs new head
      }
    }
    throw new IllegalStateException(
      s"could not merge into $root after 10 attempts (concurrent writers)")
  }
}
