package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Document deduplication for large-scale training-data pipelines:
  * exact (hash), n-gram Jaccard (inverted index), MinHash+LSH,
  * SimHash banding, and embedding-cosine. The reference has no
  * document pipeline — these are the scale-path operators a 100 TB
  * corpus needs; semantics follow the standard near-dup literature
  * (Broder MinHash / Charikar SimHash).
  *
  * Scale design: every variant avoids the naive O(n²) all-pairs
  * compare. Candidate pairs are generated only within a bucket —
  * shared shingle (ngram), shared LSH band (minhash), shared 16-bit
  * band (simhash) — so the join key distributes the work. The only
  * quadratic blowup possible is per-bucket, bounded by stop-shingle
  * frequency caps.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct content hash with the
    * canonical (minimum) doc id. Single shuffle on the hash.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** Exploded (doc_id, shingle_hash) inverted index, built by the
    * codegen'd single-pass ShingleHash expression — distinct 64-bit
    * shingle hashes straight from the text bytes, no intermediate
    * shingle strings.
    */
  private def shingleIndex(docs: DataFrame, idCol: String, textCol: String,
                           n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.ShingleHash.shingles(col(textCol), n)).as("s"))

  /** N-gram Jaccard near-dup pairs at-or-above `threshold`.
    * Plan: explode shingles → self-join on shingle (the inverted
    * index) → per-pair intersection count → join per-doc sizes →
    * |A∩B| / (|A|+|B|-|A∩B|). Three shuffles total, no cross join.
    */
  /** @param maxDf when > 0, shingles occurring in more than `maxDf`
    *   docs are dropped from the PAIR-GENERATION join only (sizes and
    *   the Jaccard denominator still use all shingles). The classic
    *   stop-shingle cap: per-shingle join fan-out is O(df²), so one
    *   boilerplate sentence shared by a million docs would otherwise
    *   dominate the whole job. Lowers recall only for pairs whose
    *   entire overlap is stop-shingles. 0 = exact (the oracle path).
    */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double, maxDf: Long = 0): DataFrame = {
    // Joining on 64-bit shingle hashes: collisions (~1e-10 at 1e5
    // distinct shingles) are the standard trade for this at scale.
    val sh = shingleIndex(docs, idCol, textCol, n)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val joinSide =
      if (maxDf <= 0) sh
      else {
        val rare = sh.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select("s")
        sh.join(rare, "s")
      }
    val common = joinSide.as("a")
      .join(joinSide.as("b"), col("a.s") === col("b.s") &&
                        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
                 .withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
                 .withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        round(col("common") / (col("sz_a") + col("sz_b") - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** MinHash signature + LSH banding candidate pairs.
    * k hash functions realized as xxhash64 with distinct seeds folded
    * per doc (one shuffle); signatures cut into `bands` bands of
    * k/bands rows; docs sharing any band key become candidates.
    * Entirely stateless — no fitted model, survives any data size.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 n: Int, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    val sh = shingleIndex(docs, idCol, textCol, n)
    val minAggs = (0 until k).map(i =>
      min(xxhash64(lit(i), col("s"))).as(s"mh_$i"))
    val sigs = sh.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
    val bandKey = (b: Int) =>
      xxhash64(lit(b) +: (0 until rows).map(r => col(s"mh_${b * rows + r}")): _*)
    val banded = sigs.select(col("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandKey(b).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** SimHash near-dup pairs: 64-bit signature per doc, banded into
    * four 16-bit segments (any equal segment ⇒ candidate — guaranteed
    * to catch every pair with hamming ≤ 3 segments' worth), then exact
    * hamming filter. Candidate generation is a band-key equi-join, not
    * an all-pairs scan.
    */
  /** Per-doc 64-bit SimHash signatures via the single-pass codegen'd
    * SimHash64 expression — no explode, no shuffle, one loop per row.
    */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String)
  : DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.functions.SimHash64.simhash64(col(textCol)).as("sig"))

  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    val withSig = simhashSignatures(docs, idCol, textCol)
    val banded = withSig.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * 16).bitwiseAND(0xFFFFL)
            .as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("sig"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        Fns.hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over a near-dup pair list (doc_a, doc_b):
    * every document labeled with the smallest doc id in its dup
    * cluster — the true canonical assignment (keepList's drop-right
    * rule under-merges transitive chains a~b~c).
    *
    * Iterative smallest-label propagation: each round every node
    * adopts the minimum label among itself and its neighbors;
    * converges in O(diameter) rounds ≤ O(log n) for typical dup
    * clusters. Each round is one join + one aggregate — all
    * distributed, no driver-side graph.
    */
  def clusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("label", "nlabel"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("nlabel")).as("nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).limit(1).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** The dedup ACTION: which documents survive. A document is dropped
    * when it has any near-dup partner with a smaller doc_id (the
    * partner is the canonical copy) — the standard keep-min rule,
    * applied as a broadcast-able anti-join of the corpus against the
    * pair list's right side. At 100 TB the pair list is orders of
    * magnitude smaller than the corpus, so the corpus never shuffles.
    */
  def keepList(docs: DataFrame, idCol: String, textCol: String,
               n: Int, threshold: Double): DataFrame = {
    val dropIds = ngramJaccard(docs, idCol, textCol, n, threshold)
      .select(col("doc_b").as(idCol)).distinct()
    docs.select(col(idCol).as("doc_id"))
      .join(broadcast(dropIds.withColumnRenamed(idCol, "doc_id")),
        Seq("doc_id"), "left_anti")
  }

  /** Embedding-cosine near-dup pairs above `threshold`. This is the
    * exact (quadratic) variant — the scale path is Ann.lshTopK which
    * buckets both sides first. Kept exact here as the oracle-checked
    * baseline; cosine accumulates left-to-right in double so results
    * are bit-identical across engines.
    */
  def embeddingCosine(emb: DataFrame, idCol: String, vecCol: String,
                      threshold: Double): DataFrame = {
    import graft.functions.VectorExpressions.dotF
    // Norms are computed ONCE per vector (n rows), not per pair (n²):
    // cosine(a,b) = dot(a,b)/(norm_a*norm_b) with norm = sqrt(dot(v,v))
    // — the same doubles the per-pair formula yields, 3× less work.
    val a = emb.select(col(idCol).as("doc_a"), col(vecCol).as("va"),
      Fns.l2Norm(col(vecCol)).as("norm_a"))
    val b = emb.select(col(idCol).as("doc_b"), col(vecCol).as("vb"),
      Fns.l2Norm(col(vecCol)).as("norm_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("cosine",
        round(dotF(col("va"), col("vb")) / (col("norm_a") * col("norm_b")), 6))
      .filter(col("cosine") >= threshold)
      .select("doc_a", "doc_b", "cosine")
  }
}
