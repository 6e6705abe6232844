package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, FeatureEng}

/** Property tests for the round-13 primitives on ARBITRARY inputs
  * (deterministic seeds): the fixture specs pin hand-computed values;
  * these pin the algebraic contracts where fixture blind spots live —
  * duplicate-heavy corpora, adversarial id distributions, random
  * token budgets.
  */
class Round13PropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val p = Gen.Parameters.default

  // the CANONICAL scalar draw — an independent byte-level reference
  // already lives in FeatureEngSpec's md5DenseRank test; here the
  // properties pin ORDER/bijection contracts, which must track the
  // one definition, not a private copy that could go stale
  private def md5h(s: String): Long =
    graft.functions.Fns.md5Hash31Of(s)

  test("md5DenseRank: bijection onto [0, n) in (md5, id) order for arbitrary long id sets") {
    val genIds = Gen.listOfN(120, Gen.choose(Long.MinValue / 2,
      Long.MaxValue / 2)).map(_.distinct)
    for (round <- 1 to 5) {
      val ids = genIds(p, Seed(round * 7919L)).get
      val got = FeatureEng.md5DenseRank(ids.toDF("id"), "id",
          buckets = 1 + round * 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = ids.sortBy(i => (md5h(i.toString), i))
        .zipWithIndex.map { case (id, r) => id -> r.toLong }.toMap
      assert(got == want, s"round $round: rank order broke")
    }
  }

  test("softDedupWeights: weights partition the corpus — every doc one row, weight_bp == 10000 DIV copies, groups consistent") {
    val genDocs = Gen.listOfN(150, Gen.choose(0, 25)).map(_.zipWithIndex)
    for (round <- 1 to 5) {
      // two NULL-text docs per round: they must form their OWN copy
      // group, not silently vanish through a null-keyed join
      val rows = genDocs(p, Seed(round * 104729L)).get
        .map { case (pool, i) => (i.toLong, s"content number $pool") } ++
        Seq((100001L, null.asInstanceOf[String]),
          (100002L, null.asInstanceOf[String]))
      val byText = rows.groupBy(_._2).map { case (t, rs) => t -> rs.size }
      val got = Dedup.softDedupWeights(rows.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(got.keySet == rows.map(_._1).toSet, "every doc exactly once")
      rows.foreach { case (id, t) =>
        val n = byText(t).toLong
        assert(got(id) == ((n, 10000L / n)), s"doc $id copies/weight")
      }
    }
  }

  test("curriculumPack: bins tile the quality-ordered stream exactly for arbitrary scores and budgets") {
    val genDocs = Gen.listOfN(80, Gen.zip(
      Gen.choose(0, 1000000), Gen.choose(1L, 400L)))
    for (round <- 1 to 5) {
      val seqLen = 64L + round * 97L
      val rows = genDocs(p, Seed(round * 31337L)).get.zipWithIndex
        .map { case ((q, n), i) => (i.toLong, q / 1e6, n) }
      val out = FeatureEng.curriculumPack(rows.toDF("doc_id", "q", "n"),
          "doc_id", "q", "n", seqLen)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(out.length == rows.length)
      // replay the packing arithmetic from the spec-side order
      val ordered = rows.sortBy { case (id, q, _) =>
        (-math.rint(q * 1e6).toLong, id) }
      var rt = 0L
      ordered.foreach { case (id, q, n) =>
        val row = out.find(_._1 == id).get
        assert(row._3 == n)
        assert(row._4 == rt / seqLen, s"bin of $id")
        assert(row._5 == rt % seqLen, s"offset of $id")
        // the decoded 6dp score round-trips
        assert(math.abs(row._2 - math.rint(q * 1e6) / 1e6) < 1e-9)
        rt += n
      }
    }
  }

  test("md5DenseRankBy: per-group bijection onto [0, n_g) in (md5, id) order for arbitrary groupings") {
    val genRows = Gen.listOfN(150, Gen.zip(Gen.choose(0, 5),
      Gen.choose(-1000000L, 1000000L))).map(_.distinct)
    for (round <- 1 to 4) {
      val rows = genRows(p, Seed(round * 15731L)).get
        .groupBy(_._2).map(_._2.head).toSeq // unique ids across groups
      val got = FeatureEng.md5DenseRankBy(rows.toDF("g", "id"), "id",
          Seq("g"), buckets = 1 + round * 5)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val want = rs.map(_._2).sortBy(i => (md5h(i.toString), i))
          .zipWithIndex.map { case (id, r) => (g, id) -> r.toLong }.toMap
        want.foreach { case (k, r) =>
          assert(got(k) == r, s"round $round group $g rank") }
      }
    }
  }

  test("lengthBatches: equal lengths share a bucket; per bucket the batches are dense, full except the last, positions in range") {
    val genDocs = Gen.listOfN(120, Gen.choose(1, 40))
    for (round <- 1 to 4) {
      val bs = 8
      val rows = genDocs(p, Seed(round * 27791L)).get.zipWithIndex
        .map { case (n, i) => (i.toLong, ("w " * n).trim) }
      val out = FeatureEng.lengthBatches(rows.toDF("doc_id", "text"),
          "doc_id", "text", nBuckets = 4, batchSize = bs)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getLong(3), r.getLong(4)))
      assert(out.length == rows.length)
      // equal token counts never split across buckets
      out.groupBy(_._2).foreach { case (_, rs) =>
        assert(rs.map(_._3).distinct.length == 1) }
      out.groupBy(_._3).foreach { case (b, rs) =>
        val batches = rs.groupBy(_._4)
        val maxIdx = batches.keys.max
        assert(batches.keySet == (0L to maxIdx).toSet, s"bucket $b dense")
        batches.foreach { case (idx, docs) =>
          assert(docs.map(_._5).toSet ==
            (0L until docs.length.toLong).toSet, "positions dense")
          if (idx < maxIdx)
            assert(docs.length == bs, s"non-final batch $idx full")
        }
      }
    }
  }

  test("minhashMd5Pairs: precision 1.0 on random dup-heavy corpora — every emitted pair is an exact >= t pair with the identical jaccard") {
    val vocab = ('a' to 'z').map(_.toString)
    val genDoc = Gen.listOfN(12, Gen.choose(0, 25)).map(
      _.map(vocab).mkString(" "))
    val genDocs = Gen.listOfN(40, genDoc)
    for (round <- 1 to 3) {
      val texts = genDocs(p, Seed(round * 49999L)).get.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val df = texts.toDF("doc_id", "text")
      val exact = Dedup.ngramJaccard(df, "doc_id", "text", 3, 0.5,
          maxDf = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      val mh = Dedup.minhashMd5Pairs(df, "doc_id", "text", 3, 16, 4, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
        .toMap
      mh.foreach { case (k, j) =>
        assert(exact.get(k).contains(j),
          s"round $round: emitted non-exact pair $k")
      }
      // exact dups (J = 1.0) always collide on all bands
      exact.filter(_._2 == 1.0).keySet.foreach(k =>
        assert(mh.contains(k), s"round $round: missed exact dup $k"))
    }
  }
}
