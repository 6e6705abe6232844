package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Fns, ShingleHash, SimHash64}

/** Parity and edge-case specs for the custom codegen expressions. */
class ExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ShingleHash count parity with the string-shingle pipeline") {
    // incl. a double-space (empty word) and a doc shorter than n
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a  b c"),      // double space → empty middle word
      (3L, "x y"),          // shorter than n=3 → zero shingles
      (4L, "a a a a a")     // repeated words → dedup matters
    ).toDF("doc_id", "text")
    val fast = docs.select(col("doc_id"),
      size(ShingleHash.shingles(col("text"), 3)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val slow = docs.select(col("doc_id"),
      size(Fns.shingles(col("text"), 3)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(fast == slow, s"fast=$fast slow=$slow")
    assert(fast(3L) == 0)
    assert(fast(4L) == 1) // all shingles identical → one distinct
  }

  test("SimHash64: identical text → identical sig; near text → small hamming") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and agaim"),
      (3L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id"),
      SimHash64.simhash64(col("text")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) < ham(sigs(1L), sigs(3L)))
    assert(ham(sigs(1L), sigs(2L)) <= 16)
  }

  test("FloatVecDot: null array → null, length mismatch → shorter prefix") {
    import graft.functions.VectorExpressions.dotF
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f, 9.0f))),
      (2L, None, Some(Array(1.0f)))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), dotF(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(11.0)) // 1*3 + 2*4, extra element ignored
    assert(out(2L).isEmpty)
  }
}
