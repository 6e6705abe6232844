package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for crawl-quality weighting — the standard
  * web-corpus signal (a page linked by many well-linked hosts is
  * worth more training tokens than a link-farm leaf; CommonCrawl
  * publishes exactly this as its host-level ranking).
  *
  * PageRank here is FIXED-POINT INTEGER arithmetic in micro-units
  * (the Dsir micro-log-ratio precedent): the unit mass is
  * `massMicro` (10^12), damping is an integer percentage, and every
  * per-edge contribution is an integer `div`. Floating-point power
  * iteration sums in engine- and partitioning-dependent order, so
  * two runs of the "same" PageRank can disagree in the last ulps and
  * a SQL oracle can never replay it exactly; integer division makes
  * the whole 5-iteration fit bit-reproducible across engines,
  * partitionings, and reruns — worth the ≤(n_edges + 2) micro-units
  * of mass the floors leak per iteration (documented, not hidden).
  *
  * Scale shape: each iteration is one equi-join of the edge table
  * with the current rank vector plus one groupBy(dst) — the classic
  * iterative-join plan, hash-partitionable on node id, lineage cut
  * per iteration by a lazy localCheckpoint exactly like
  * [[Dedup]]'s pointer-jump rounds. Dangling mass (nodes with no
  * outlinks) is redistributed uniformly, the standard correction.
  */
object LinkGraph {

  /** Power-iteration PageRank over an edge table.
    *
    * @param edges      (src, dst) long columns; self-loops dropped,
    *                   duplicate edges collapsed (simple-graph
    *                   semantics — one vote per distinct link)
    * @param nIter      fixed iteration count (the oracle unrolls it)
    * @param dampingPct damping factor as an integer percent
    * @param massMicro  total rank mass in micro-units
    * @return (node, pr_micro) — pr_micro / massMicro is the rank
    */
  def pageRankMicro(edges: DataFrame, nIter: Int = 5,
                    dampingPct: Int = 85,
                    massMicro: Long = 1000000000000L): DataFrame = {
    require(nIter >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outd"))
    val nDf = nodes.agg(count(lit(1)).as("n"))
    val d = dampingPct
    var r = nodes.crossJoin(nDf)
      .select(col("node"), expr(s"CAST($massMicro AS BIGINT) div n")
        .as("rank"))
      .localCheckpoint(false)
    for (_ <- 1 to nIter) {
      val withOut = r.join(outdeg, r("node") === outdeg("src"), "left")
      val dangDf = withOut.filter(col("outd").isNull)
        .agg(coalesce(sum("rank"), lit(0L)).as("dang"))
      val contrib = e
        .join(withOut.filter(col("outd").isNotNull)
          .select(col("node").as("cn"), col("rank"), col("outd")),
          e("src") === col("cn"))
        .select(col("dst").as("node"),
          expr(s"($d * rank) div (100 * outd)").as("c"))
        .groupBy("node").agg(sum("c").as("inflow"))
      r = nodes.crossJoin(nDf).crossJoin(dangDf)
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (expr(s"((100 - $d) * CAST($massMicro AS BIGINT)) div (100 * n)") +
            expr(s"($d * dang) div (100 * n)") +
            coalesce(col("inflow"), lit(0L))).as("rank"))
        .localCheckpoint(false)
    }
    r.select(col("node"), col("rank").as("pr_micro"))
  }
}
