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

  test("compressed corpora: .jsonl.gz reads transparently, quarantine included") {
    // hand-build a gzip shard (the wire format, not a Spark write)
    val f = java.nio.file.Files.createTempFile("srcgz", ".jsonl.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(f))
    out.write(Seq(
      """{"doc_id": 1, "text": "compressed one"}""",
      """{"doc_id": 2 "text": "BAD LINE"}""",
      """{"doc_id": 3, "text": "compressed three"}""")
      .mkString("\n").getBytes("UTF-8"))
    out.close()
    val (clean, corrupt) =
      Sources.readJsonlQuarantined(spark, f.toString, docSchema)
    assert(clean.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    assert(corrupt.collect().map(_.getString(0))
      .exists(_.contains("BAD LINE")))
  }

  test("compressed corpora: .jsonl.zst round-trips through the zstd-jni codec") {
    val docs = Seq((1L, "zstd alpha"), (2L, "zstd \"beta\""),
      (3L, "zstd line\nbreak")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("srczst")
      .toString + "/out"
    Sources.writeJsonlZst(docs.repartition(2), dir)
    // files actually carry the extension (codec engaged on write)
    val files = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("part"))
    assert(files.nonEmpty && files.forall(_.endsWith(".zst")),
      s"expected .zst shards, got ${files.toSeq}")
    // and the payload is a real zstd frame (magic 28 B5 2F FD), not
    // silently-uncompressed text under a .zst name
    val first = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".zst")).head
    val magic = java.nio.file.Files.readAllBytes(first.toPath).take(4)
    assert((magic(0) & 0xFF) == 0x28 && (magic(1) & 0xFF) == 0xB5 &&
      (magic(2) & 0xFF) == 0x2F && (magic(3) & 0xFF) == 0xFD,
      s"not a zstd frame: ${magic.map(b => f"${b & 0xFF}%02X").toSeq}")
    val (clean, corrupt) =
      Sources.readJsonlQuarantined(spark, dir, docSchema)
    assert(corrupt.count() == 0)
    assert(clean.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "zstd alpha"), (2L, "zstd \"beta\""), (3L, "zstd line\nbreak")))
  }

  test("compressed corpora: a malformed line inside a .zst shard still quarantines") {
    import com.github.luben.zstd.ZstdOutputStreamNoFinalizer
    Sources.registerCompressionCodecs(spark)
    val f = java.nio.file.Files.createTempFile("srczq", ".jsonl.zst")
    val z = new ZstdOutputStreamNoFinalizer(
      java.nio.file.Files.newOutputStream(f))
    z.write(Seq(
      """{"doc_id": 7, "text": "fine"}""",
      """{broken""",
      """{"doc_id": 9, "text": "also fine"}""")
      .mkString("\n").getBytes("UTF-8"))
    z.close()
    val (clean, corrupt) =
      Sources.readJsonlQuarantined(spark, f.toString, docSchema)
    assert(clean.collect().map(_.getLong(0)).sorted.toSeq == Seq(7L, 9L))
    assert(corrupt.collect().map(_.getString(0))
      .exists(_.contains("{broken")))
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

  test("Catalog.discover: partitioned layouts are one dataset, namespaces recurse, rows from footers") {
    val base = java.nio.file.Files.createTempDirectory("catalog2").toString
    def mkdir(p: String) =
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))

    // the offline store's own materialization layout:
    // entity_type=X/event_date=Y — must classify as ONE parquet
    // dataset with both partition columns, row count from footers
    val mat = s"$base/feature_mat"
    (1 to 20).map(i => (i.toLong, i * 1.5,
        if (i % 2 == 0) "user" else "item", s"2026-0${i % 3 + 1}-01"))
      .toDF("id", "value", "entity_type", "event_date")
      .repartition(2)
      .write.partitionBy("entity_type", "event_date")
      .mode("overwrite").parquet(mat)

    // a namespace dir holding two nested datasets
    val ns = s"$base/team_a"
    val nested1 = s"$ns/events_pq"
    Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(nested1)
    val nested2 = s"$ns/corpus_raw"
    mkdir(nested2)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$nested2/p0.jsonl"),
      "{\"doc_id\":1}\n".getBytes)

    val got = graft.sources.Catalog
      .discover(spark, base, countRows = true)
      .collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(got.size == 3, s"datasets found: ${got.keySet}")

    val m = got("feature_mat")
    assert(m.getAs[String]("kind") == "parquet")
    assert(m.getAs[String]("partition_cols") == "entity_type,event_date")
    assert(m.getAs[Long]("est_rows") == 20L,
      s"footer row sum: ${m.getAs[Long]("est_rows")}")
    assert(m.getAs[String]("schema_json").contains("entity_type"),
      "partition columns must appear in the schema")

    val n1 = got("team_a/events_pq")
    assert(n1.getAs[String]("kind") == "parquet" &&
      n1.getAs[Long]("est_rows") == 3L &&
      n1.getAs[String]("partition_cols") == null)
    assert(got("team_a/corpus_raw").getAs[String]("kind") == "jsonl")

    // depth limit: maxDepth=1 sees only direct children — the
    // namespace dir degrades to an honest unknown row
    val shallow = graft.sources.Catalog
      .discover(spark, base, maxDepth = 1)
      .collect().map(r => r.getAs[String]("name") ->
        r.getAs[String]("kind")).toMap
    assert(shallow("feature_mat") == "parquet")
    assert(shallow("team_a") == "unknown")
  }

  // --- WARC ingestion (graft.functions.WarcRecords / operators.Warc) ---

  private def warcRecord(headers: Seq[(String, String)], content: String): String = {
    val h = headers.map { case (k, v) => s"$k: $v\r\n" }.mkString
    val body = content.getBytes("UTF-8")
    s"WARC/1.0\r\n${h}Content-Length: ${body.length}\r\n\r\n$content\r\n\r\n"
  }

  private def parseSeg(seg: String) = {
    val df = Seq((1L, seg.getBytes("UTF-8"))).toDF("seg_id", "segment")
    graft.operators.Warc.records(df, "seg_id", "segment")
      .orderBy("rec_idx").collect()
  }

  test("WARC: length-framed walk survives a body that embeds a WARC version line") {
    // a regex/split-by-signature implementation desyncs on rec1's
    // body; the Content-Length walker must not.
    val evil = "look: WARC/1.0\r\nWARC-Type: response\r\n\r\n is just text"
    val seg =
      warcRecord(Seq("WARC-Type" -> "resource",
        "WARC-Target-URI" -> "https://a.example/x"), evil) +
      warcRecord(Seq("WARC-Type" -> "resource",
        "WARC-Target-URI" -> "https://a.example/y"), "second body")
    val out = parseSeg(seg)
    assert(out.length == 2)
    assert(out(0).getAs[String]("body") == evil)
    assert(out(1).getAs[String]("target_uri") == "https://a.example/y")
    assert(out(1).getAs[String]("body") == "second body")
  }

  test("WARC: response records split HTTP payload — status, header override, entity body") {
    val html = "<html><body>hi</body></html>"
    val http = s"HTTP/1.1 404 Not Found\r\nContent-Type: text/html; charset=UTF-8\r\nX-Other: y\r\n\r\n$html"
    val seg = warcRecord(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "https://a.example/missing",
      "WARC-Date" -> "2026-02-03T04:05:06Z",
      "Content-Type" -> "application/http; msgtype=response"), http)
    val r = parseSeg(seg).head
    assert(r.getAs[String]("warc_type") == "response")
    assert(r.getAs[Int]("status") == 404)
    // HTTP-level Content-Type overrides the WARC-level one
    assert(r.getAs[String]("content_type") == "text/html; charset=UTF-8")
    assert(r.getAs[String]("warc_date") == "2026-02-03T04:05:06Z")
    assert(r.getAs[String]("body") == html)
  }

  test("WARC: header names are case-insensitive; non-HTTP records keep raw content") {
    val seg = "WARC/1.0\r\nwarc-type: warcinfo\r\ncontent-type: application/warc-fields\r\n" +
      "content-length: 16\r\n\r\nsoftware: graft\n\r\n\r\n"
    val r = parseSeg(seg).head
    assert(r.getAs[String]("warc_type") == "warcinfo")
    assert(r.isNullAt(r.fieldIndex("target_uri")))
    assert(r.isNullAt(r.fieldIndex("status")))
    assert(r.getAs[String]("content_type") == "application/warc-fields")
    assert(r.getAs[String]("body") == "software: graft\n")
  }

  test("WARC: salvage semantics — truncated tail keeps parsed prefix, garbage head is NULL") {
    val good = warcRecord(Seq("WARC-Type" -> "resource"), "ok")
    // truncated: declared length runs past the buffer
    val truncated = good + "WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 9999\r\n\r\nshort"
    val out = parseSeg(truncated)
    assert(out.length == 1 && out(0).getAs[String]("body") == "ok")
    // not WARC at all → null array → zero exploded rows
    assert(parseSeg("HTTP/1.1 200 OK\r\n\r\n").isEmpty)
    // UTF-8 multibyte body: Content-Length is BYTES, not chars
    val uni = warcRecord(Seq("WARC-Type" -> "resource"), "héllo wörld ✓") +
      warcRecord(Seq("WARC-Type" -> "resource"), "after")
    val u = parseSeg(uni)
    assert(u.length == 2 && u(0).getAs[String]("body") == "héllo wörld ✓" &&
      u(1).getAs[String]("body") == "after")
  }
}
