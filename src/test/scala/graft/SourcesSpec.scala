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
}
