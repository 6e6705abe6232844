package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LinkGraph, Sketch}

/** Property tests for the round-10 sketch/graph invariants on
  * ARBITRARY inputs (deterministic seeds): the deterministic-fixture
  * specs in SketchSpec/LinkGraphSpec pin hand-computed values; these
  * pin the algebraic contracts — additivity, one-sidedness, merge
  * equality, mass bounds — under random multisets, random shard
  * splits, and random graphs, where the fixture blind spots live
  * (duplicate-heavy keys, empty shards, skewed splits).
  */
class SketchPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val p = Gen.Parameters.default

  // key multisets heavy in duplicates (keys drawn from a small pool)
  private val genKeys = Gen.listOfN(300,
    Gen.choose(0, 60).map(i => s"k$i"))
  // a 3-way split assignment per row
  private val genSplit = Gen.listOfN(300, Gen.choose(0, 2))

  test("CM: additivity + one-sidedness hold on random multisets and splits") {
    for (round <- 1 to 6; fast <- Seq(false, true)) {
      val keys = genKeys(p, Seed(round * 7919L)).get
      val split = genSplit(p, Seed(round * 104729L)).get
      val rows = keys.zip(split)
      def cells(ks: Seq[String]): Map[(Int, Long), Long] =
        if (ks.isEmpty) Map.empty
        else Sketch.cmSketchRows(ks.toDF("k"), "k", depth = 2,
            width = 32, fast = fast)
          .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
          .toMap
      val whole = cells(keys)
      val summed = (0 to 2).map(s => cells(rows.filter(_._2 == s).map(_._1)))
        .reduce { (a, b) => (a.keySet ++ b.keySet).map(x =>
          x -> (a.getOrElse(x, 0L) + b.getOrElse(x, 0L))).toMap }
      assert(summed === whole, s"additivity round=$round fast=$fast")
      // one-sidedness for every distinct key
      val exact = keys.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      val probes = exact.keys.toSeq.toDF("probe_key")
      val est = Sketch.cmPointEstimate(
          Sketch.cmSketchRows(keys.toDF("k"), "k", 2, 32, fast = fast),
          probes, "probe_key", 2, 32, fast = fast)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (k, c) =>
        assert(est(k) >= c, s"undercount $k round=$round fast=$fast")
      }
    }
  }

  test("KMV/quantile bottom-k: shard re-trim equals direct on random splits") {
    for (round <- 1 to 6) {
      val keys = genKeys(p, Seed(round * 31L)).get
      val split = genSplit(p, Seed(round * 997L)).get
      val rows = keys.zip(split).map { case (k, s) => (s"s${s % 2}", k) }
      def bottom(rs: Seq[(String, String)]): Set[(String, String)] =
        if (rs.isEmpty) Set.empty
        else Sketch.kmvSketchRows(rs.toDF("slice", "k"), "k", "slice", k = 8)
          .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val direct = bottom(rows)
      // re-trim of the union of per-shard bottom-ks == direct bottom-k
      val parts = (0 to 2).map(s =>
        rows.zip(split).filter(_._2 == s).map(_._1))
      val merged = parts.map(bottom).reduce(_ ++ _)
      val retrim = merged.groupBy(_._1).toSeq.flatMap { case (_, hs) =>
        hs.toSeq.sortBy(_._2).take(8)
      }.toSet
      assert(retrim === direct, s"round=$round")
    }
  }

  test("LinkGraph: mass bound + determinism on random graphs") {
    val genEdges = Gen.listOfN(60,
      for { a <- Gen.choose(0L, 15L); b <- Gen.choose(0L, 15L) } yield (a, b))
    for (round <- 1 to 5) {
      val edges = genEdges(p, Seed(round * 6131L)).get
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val r = LinkGraph.pageRankMicro(df, nIter = 3)
          .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
        val total = r.values.sum
        val nE = edges.distinct.size
        assert(total <= 1000000000000L, s"mass exceeded round=$round")
        // floor leak per iteration ≤ edges (contrib floors) + 2·nodes
        // (base + dangling-share floors); init leaks ≤ nodes
        assert(total >= 1000000000000L - 3L * (nE + 2L * r.size) - r.size,
          s"mass leaked beyond the floor bound round=$round ($total)")
        // determinism: a different partitioning gives identical ranks
        val r2 = LinkGraph.pageRankMicro(df.repartition(7), nIter = 3)
          .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
        assert(r2 === r, s"partitioning-dependent round=$round")
      }
    }
  }
}
