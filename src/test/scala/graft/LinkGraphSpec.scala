package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinkGraph

class LinkGraphSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], nIter: Int): Map[Long, Long] =
    LinkGraph.pageRankMicro(edges.toDF("src", "dst"), nIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2-cycle is the fixed point: ranks stay exactly mass/2") {
    // a→b, b→a: contrib = 85·5e11 div 100 = 4.25e11,
    // base = 15e12 div 200 = 7.5e10, sum = 5e11 — every iteration
    val r = ranks(Seq((1L, 2L), (2L, 1L)), nIter = 5)
    assert(r === Map(1L -> 500000000000L, 2L -> 500000000000L))
  }

  test("dangling node: mass redistributes, hand-computed one iteration") {
    // a→b, b dangles. r0 = 5e11 each; dang = 5e11;
    // base = 7.5e10; dang share = 85·5e11 div 200 = 2.125e11;
    // a gets base+share, b additionally a's full contribution 4.25e11
    val r = ranks(Seq((1L, 2L)), nIter = 1)
    assert(r(1L) === 75000000000L + 212500000000L)
    assert(r(2L) === 75000000000L + 212500000000L + 425000000000L)
    assert(r(1L) + r(2L) === 1000000000000L, "no mass leak here")
  }

  test("self-loops and duplicate edges are ignored (simple graph)") {
    val base = ranks(Seq((1L, 2L), (2L, 1L)), 3)
    val noisy = ranks(Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 1L)), 3)
    assert(noisy === base)
  }

  test("hub dominates; mass conserved within the documented floor leak") {
    // star + chain: everyone links the hub, hub links one spoke
    val edges = (1L to 20L).map(i => (i, 0L)) :+ (0L, 1L)
    val r = ranks(edges, 5)
    assert(r(0L) === r.values.max, "hub must rank highest")
    val total = r.values.sum
    // floor leak per iteration ≤ edges (per-edge contribution floors)
    // + 2·nodes (base + dangling-share floors); init leaks ≤ nodes
    assert(total <= 1000000000000L &&
      total >= 1000000000000L - 5L * (edges.size + 2L * r.size) - r.size,
      s"mass $total")
  }

  test("rank is partitioning-independent (exact integers)") {
    val edges = (1L to 50L).map(i => (i, (i * 7 + 3) % 50))
    val a = ranks(edges, 4)
    val b = LinkGraph.pageRankMicro(
        edges.toDF("src", "dst").repartition(13), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("q_pagerank shape: host 0 is the hub on the documents graph") {
    val out = SparkEntry.qPageRank(spark, TestSpark.sfDir)
      .orderBy(desc("pr_micro")).limit(1).head()
    assert(out.getLong(0) === 0L)
  }

  test("trustRank: hand-computed one iteration, seed-only teleport") {
    // a→b, seed {a}: r0 = (1e12, 0). a's contribution to b =
    // 85·1e12 div 100 = 8.5e11; b dangles with rank 0 → dang 0;
    // base to the single seed = 15e12 div 100 = 1.5e11, 0 to b.
    val r = LinkGraph.trustRankMicro(
        Seq((1L, 2L)).toDF("src", "dst"), Seq(1L).toDF("node"), nIter = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 150000000000L, 2L -> 850000000000L))
  }

  test("trustRank: unendorsed hosts score exactly zero (spam demotion)") {
    // two disjoint 2-cycles; seeds only in the first — the second
    // component must hold ZERO trust, while uniform PageRank gives
    // it a quarter of the mass per node
    val edges = Seq((1L, 2L), (2L, 1L), (8L, 9L), (9L, 8L))
    val tr = LinkGraph.trustRankMicro(
        edges.toDF("src", "dst"), Seq(1L).toDF("node"), nIter = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(tr(8L) === 0L && tr(9L) === 0L)
    assert(tr(1L) > 0L && tr(2L) > 0L)
    val pr = ranks(edges, 5)
    assert(pr(8L) === 250000000000L && pr(9L) === 250000000000L,
      "uniform teleport hands the disconnected component base rank")
  }

  test("trustRank: seeds outside the graph are ignored; all-nodes seeds == pageRank") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val withGhost = LinkGraph.trustRankMicro(edges.toDF("src", "dst"),
        Seq(1L, 2L, 3L, 99L).toDF("node"), 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(withGhost === ranks(edges, 3),
      "teleport over all graph nodes must reduce to uniform PageRank")
  }

  test("trustRank: a seed set absent from the graph fails loudly") {
    // nt = 0 would make every integer div NULL and propagate silent
    // NULL ranks through all iterations — must throw instead
    val ex = intercept[IllegalArgumentException] {
      LinkGraph.trustRankMicro(Seq((1L, 2L)).toDF("src", "dst"),
        Seq(99L).toDF("node"), nIter = 2).collect()
    }
    assert(ex.getMessage.contains("teleport set is empty"))
  }
}
