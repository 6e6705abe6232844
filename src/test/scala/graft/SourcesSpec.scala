package graft

import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docSchema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  private def tmpFile(lines: Seq[String], suffix: String): String = {
    val f = java.nio.file.Files.createTempFile("src", suffix)
    java.nio.file.Files.write(f,
      lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("JSONL quarantine: clean rows flow, corrupt lines retained verbatim, nothing lost") {
    val path = tmpFile(Seq(
      """{"doc_id": 1, "text": "hello world"}""",
      """{"doc_id": 2, "text": "second doc"}""",
      """{"doc_id": 3 "text": "MISSING COMMA"}""", // malformed
      """{"doc_id": 4, "text": "fourth"}"""), ".jsonl")
    val (clean, corrupt) = Sources.readJsonlQuarantined(spark, path, docSchema)
    assert(clean.columns.toSeq == Seq("doc_id", "text"))
    assert(clean.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 4L))
    val bad = corrupt.collect().map(_.getString(0))
    assert(bad.length == 1 && bad.head.contains("MISSING COMMA"),
      s"the corrupt line must be retained verbatim: ${bad.toSeq}")
  }

  test("JSONL strict: a malformed line aborts the read") {
    val path = tmpFile(Seq(
      """{"doc_id": 1, "text": "ok"}""",
      """not json at all"""), ".jsonl")
    intercept[org.apache.spark.SparkException] {
      Sources.readJsonlStrict(spark, path, docSchema).count()
    }
  }

  test("CSV quarantine: malformed row split out, clean side typed") {
    val path = tmpFile(Seq(
      "doc_id,text",
      "1,hello",
      "not_a_number,world", // doc_id fails to parse
      "3,third"), ".csv")
    val (clean, corrupt) = Sources.readCsvQuarantined(spark, path, docSchema)
    assert(clean.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    assert(corrupt.count() == 1)
  }

  test("JSONL round-trip: write then quarantined read is lossless") {
    val docs = Seq((1L, "alpha"), (2L, "beta \"quoted\" text"),
      (3L, "line\nbreak")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString + "/out"
    Sources.writeJsonl(docs, dir)
    val (back, corrupt) = Sources.readJsonlQuarantined(spark, dir, docSchema)
    assert(corrupt.count() == 0)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "alpha"), (2L, "beta \"quoted\" text"), (3L, "line\nbreak")))
  }

  test("Catalog.discover classifies children, reads manifests, quarantines bad ones") {
    import graft.offline.VersionedStore
    val base = java.nio.file.Files.createTempDirectory("catalog").toString
    def sub(n: String) = { val p = s"$base/$n";
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p)); p }

    // a VersionedStore table: manifest-only metadata (3 rows)
    val vdir = s"$base/events_v"
    VersionedStore.create(Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "v"), vdir)
    // a plain parquet directory
    val pdir = sub("plain_parquet")
    Seq((1L, 2.0), (2L, 3.0)).toDF("k", "x")
      .coalesce(1).write.mode("overwrite").parquet(pdir)
    // a jsonl corpus WITH a valid registration manifest
    val jdir = sub("raw_corpus")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$jdir/part0.jsonl"),
      "{\"doc_id\":1}\n".getBytes)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$jdir/dataset_manifest.json"),
      """{"id":"corpus_main","description":"raw docs","params":[]}"""
        .getBytes)
    // a malformed manifest — must be KEPT with the error recorded
    val bdir = sub("bad_manifest")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$bdir/data.csv"),
      "a,b\n1,2\n".getBytes)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bdir/dataset_manifest.json"),
      "{not json at all".getBytes)
    sub("empty_ds")

    val got = graft.sources.Catalog.discover(spark, base, countRows = true)
      .collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(got.size == 5)
    val v = got("events_v")
    assert(v.getAs[String]("kind") == "versioned" &&
      v.getAs[Long]("est_rows") == 3L &&
      v.getAs[Long]("latest_version") == 0L &&
      v.getAs[String]("schema_json").contains("\"id\""))
    val p = got("plain_parquet")
    assert(p.getAs[String]("kind") == "parquet" &&
      p.getAs[Long]("est_rows") == 2L &&
      p.getAs[String]("schema_json").contains("\"k\""))
    val j = got("raw_corpus")
    assert(j.getAs[String]("kind") == "jsonl" &&
      j.getAs[Long]("n_files") == 1L && // the manifest is NOT a corpus file
      j.getAs[String]("dataset_id") == "corpus_main" &&
      j.getAs[String]("description") == "raw docs" &&
      j.getAs[String]("manifest_error") == null)
    val b = got("bad_manifest")
    assert(b.getAs[String]("kind") == "csv" &&
      b.getAs[String]("manifest_error") != null &&
      b.getAs[String]("manifest_json").startsWith("{not"))
    assert(got("empty_ds").getAs[String]("kind") == "empty")
    // stable order by dataset_id (manifest id overrides the dir name)
    val ids = graft.sources.Catalog.discover(spark, base)
      .collect().map(_.getAs[String]("dataset_id")).toSeq
    assert(ids == ids.sorted)
  }
}
