package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Search

/** Property test: the distributed BM25 scorer must agree with a naive
  * in-memory BM25 on arbitrary tiny corpora — including repeated
  * terms, empty/one-word docs, queries with out-of-vocabulary terms,
  * and rank ties — and the persisted-index serve must agree with the
  * batch scorer on the same layouts.
  */
class SearchPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  // small vocabulary on purpose: collisions, shared terms, and ties
  private val genWord = Gen.oneOf("a", "b", "c", "d", "e", "f")
  private val genDoc = Gen.choose(0, 6).flatMap(n =>
    Gen.listOfN(n, genWord).map(_.mkString(" ")))
  private val genCorpus = Gen.choose(3, 8).flatMap(n =>
    Gen.listOfN(n, genDoc).map(_.zipWithIndex.map {
      case (t, i) => (i.toLong, t) }))
  private val genQuery = Gen.choose(1, 3).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf("a", "b", "c", "zz")).map(_.mkString(" ")))

  private def naiveBm25(corpus: Seq[(Long, String)], query: String,
                        k1: Double = 1.2, b: Double = 0.75)
  : Seq[(Long, Double)] = {
    val docTerms = corpus
      .map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSeq }
      .filter(_._2.nonEmpty)
    val n = docTerms.size.toLong
    if (n == 0) return Nil
    val avgdl = docTerms.map(_._2.size).sum.toDouble / n
    val df = docTerms.flatMap(_._2.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val qterms = query.split(" ").filter(_.nonEmpty).distinct
    docTerms.flatMap { case (id, terms) =>
      val dl = terms.size.toLong
      val contribs = qterms.toSeq.filter(terms.contains).map { t =>
        val tf = terms.count(_ == t).toLong
        val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
        val tfc = (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
        BigDecimal(idf * tfc)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      if (contribs.isEmpty) None
      else Some(id -> BigDecimal(contribs.sum.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("bm25TopK == naive in-memory BM25 on random tiny corpora; serve == batch") {
    (1 to 10).foreach { round =>
      val p = Gen.Parameters.default
      val corpus = genCorpus(p, Seed(round * 7919L)).get
      val query = genQuery(p, Seed(round * 104729L)).get
      val docs = corpus.toDF("doc_id", "text")
      val queries = Seq((0L, query)).toDF("q_id", "q_text")
      val got = Search.bm25TopK(docs, "doc_id", "text",
        queries, "q_id", "q_text", k = 100)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      val want = naiveBm25(corpus, query)
        .sortBy { case (id, s) => (-s, id) }
        .zipWithIndex.map { case ((id, s), i) => (id, (i + 1).toLong, s) }
      assert(got.toSeq == want,
        s"round $round corpus=$corpus query='$query'")
      // serve parity on the same layout (skip empty corpora — the
      // index build requires at least one posting)
      if (want.nonEmpty) {
        val root = java.nio.file.Files
          .createTempDirectory(s"bm25prop$round").toString + "/idx"
        Search.buildTextIndex(spark, docs, "doc_id", "text", root,
          nFiles = 2)
        val served = Search.serveBm25(spark, root, queries,
          "q_id", "q_text", k = 100)
          .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
        assert(served.toSeq == want, s"serve diverged on round $round")
      }
    }
  }
}
