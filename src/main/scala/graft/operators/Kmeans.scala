package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DISTRIBUTED corpus-scale k-means over an embedding column — the
  * clustering artifact cluster-based curation consumes (SemDeDup
  * prunes within k-means cells, Abbas et al. 2023; cluster-balanced
  * selection flattens topic skew, the MiniPile/DCLM recipe). The
  * engine already owns two SAMPLE-trained Lloyd variants (the IVF
  * coarse quantizer and the PQ codebooks in [[Ann]] — driver-bounded
  * models for ANN serving); this operator is the third tier: the FIT
  * ITSELF is distributed, every assignment + centroid update runs as
  * Spark aggregates over the full corpus, so the cluster table is a
  * corpus artifact, not a sample approximation.
  *
  * DETERMINISM (the engine's fixed-point idiom): vectors round to
  * 1e-6 micro longs ONCE (pure per-row function); distances are
  * exact integer squared-L2 (no float accumulation order); argmin
  * ties break to the lowest cluster id; centroid updates are exact
  * long sums (associative — partitioning-independent) divided by
  * exact counts (floor). Init is the k vectors with the smallest
  * md5(vec_id) (total order, tie on id) — no RNG, no sample. Every
  * step replays in SQL, so the whole iterative fit is oracle-checked
  * end-to-end (the q_pagerank/q_dedup_clusters precedent).
  *
  * SCALE SHAPE: per iteration, assignment is ONE codegen projection
  * (the [[graft.functions.VectorExpressions.nearestCentroid]]
  * expression probes the k·dim-long centroid table inlined as a
  * literal — no join, no shuffle) and the update is ONE map-side-
  * combinable aggregate (k·dim partial rows per input partition —
  * a hot cluster costs nothing extra). Driver state is k·dim longs
  * per iteration (kilobytes). The corpus-sized frame is
  * localCheckpointed once and reused across iterations.
  */
object Kmeans {

  /** A fitted model: flat row-major (cluster*dim + i) micro
    * centroids. */
  final case class KmModel(k: Int, dim: Int, centroids: Array[Long]) {
    require(centroids.length == k * dim)
  }

  /** Integer-micro view of a float-array embedding column: each
    * component rounds HALF-UP to 1e-6 micros — the one rounding this
    * operator ever applies to input data. Codegen (the MicroVec
    * expression): a `transform` lambda here would interpret the hot
    * path and break whole-stage codegen for the assignment chain. */
  def microVec(vec: Column): Column =
    graft.functions.VectorExpressions.microVec(vec)

  /** Deterministic init: the k vectors with the smallest
    * md5Hash31(vec_id), ties on vec_id; cluster c = position c in
    * that order. A distributed bottom-k (TakeOrderedAndProject —
    * never a global sort). */
  def init(emb: DataFrame, idCol: String, vecCol: String, k: Int,
           dim: Int): KmModel =
    initFromVm(vmProjection(emb, idCol, vecCol, dim), k, dim)

  /** The shared (id, vm) projection + validity filter: wrong-dim
    * vectors AND vectors carrying null components are excluded HERE,
    * so [[initFromVm]] and assignment see the same population
    * (NearestCentroidMicro already excludes null-component vectors;
    * without this filter init would silently seed a centroid from a
    * vector whose null components unbox to 0). The `exists` lambda is
    * CodegenFallback, but this projection runs once per fit (it is
    * localCheckpointed) — never in the per-row serving path, where
    * the expression's own null exclusion carries the contract. */
  private def vmProjection(emb: DataFrame, idCol: String,
                           vecCol: String, dim: Int): DataFrame =
    emb.select(col(idCol).as("id"), microVec(col(vecCol)).as("vm"))
      .filter(size(col("vm")) === dim &&
        !exists(col("vm"), _.isNull))

  /** Init over a frame ALREADY carrying (id, vm) micro vectors —
    * [[fit]] calls this so the corpus is micro-rounded exactly once. */
  private def initFromVm(vmDf: DataFrame, k: Int, dim: Int): KmModel = {
    val rows = vmDf
      .filter(size(col("vm")) === dim)
      .orderBy(graft.functions.Fns.md5Hash31(col("id").cast("string")),
        col("id"))
      .limit(k)
      .select("vm").collect()
    require(rows.length == k, s"need at least $k vectors of dim $dim")
    val flat = new Array[Long](k * dim)
    rows.zipWithIndex.foreach { case (r, c) =>
      val v = r.getSeq[Long](0)
      var i = 0
      while (i < dim) { flat(c * dim + i) = v(i); i += 1 }
    }
    KmModel(k, dim, flat)
  }

  /** Lloyd iterations over the full corpus. Per iteration: codegen
    * argmin assignment against the literal centroid table, then one
    * (cluster, dim-index)-keyed exact-integer aggregate; an empty
    * cluster keeps its previous centroid (deterministic — the SQL
    * oracle's LEFT JOIN/coalesce mirrors it). */
  def fit(emb: DataFrame, idCol: String, vecCol: String, k: Int,
          dim: Int, iters: Int): KmModel = {
    require(iters >= 0)
    val vm = vmProjection(emb, idCol, vecCol, dim)
      .localCheckpoint(false) // one corpus materialization, reused per iter
    var model = initFromVm(vm, k, dim)
    var it = 0
    while (it < iters) {
      val sums = assignVm(vm, model)
        .select(col("cluster"), posexplode(col("vm")).as(Seq("i", "v")))
        .groupBy("cluster", "i")
        .agg(sum("v").as("sv"), count(lit(1)).as("n"))
        .collect()
      val next = model.centroids.clone() // empty cluster keeps centroid
      sums.foreach { r =>
        val c = r.getInt(0)
        val i = r.getInt(1)
        // TRUNCATING division (Java long /): micro sums can be
        // negative, and DuckDB's integer `//` truncates toward zero —
        // floorDiv would drift one micro on negative dimensions.
        next(c * dim + i) = r.getLong(2) / r.getLong(3)
      }
      model = KmModel(k, dim, next)
      it += 1
    }
    model
  }

  /** `vm` must already carry (id, vm) micro vectors. */
  private def assignVm(vm: DataFrame, model: KmModel): DataFrame =
    vm.withColumn("nc", graft.functions.VectorExpressions
        .nearestCentroid(col("vm"), model.centroids, model.k, model.dim))
      .filter(col("nc").isNotNull)
      .select(col("id"), col("vm"), col("nc.cluster").as("cluster"),
        col("nc.dist_micro2").as("dist_micro2"))

  /** Coarse quantizer over a fitted model's OWN centroids — the
    * driver-side half of the large-k assignment tier. The k centroids
    * (k·dim longs — kilobytes to a few MB, driver-sized by
    * construction) are clustered with the SAME deterministic integer
    * Lloyd the corpus fit uses: md5-bottom-nCoarse init on the
    * cluster id, exact long squared-L2 with ties to the lowest id,
    * exact sums with truncating division, empty cells keep their
    * centroid. Members come back as a CSR inverted list with
    * ascending ids per cell. */
  final case class TieredIndex(coarse: Array[Long], nCoarse: Int,
                               memberOffsets: Array[Int],
                               members: Array[Int])

  private def md5h31(s: String): Long =
    graft.functions.Fns.md5Hash31Of(s)

  def tieredIndex(model: KmModel, nCoarse: Int,
                  coarseIters: Int = 5): TieredIndex = {
    val (k, dim, cs) = (model.k, model.dim, model.centroids)
    require(nCoarse >= 1 && nCoarse <= k,
      s"nCoarse must be in [1, k=$k]; got $nCoarse")
    // deterministic init: bottom-nCoarse centroid ids by md5 draw
    val seedIds = (0 until k)
      .sortBy(c => (md5h31(c.toString), c)).take(nCoarse)
    val coarse = new Array[Long](nCoarse * dim)
    seedIds.zipWithIndex.foreach { case (c, g) =>
      System.arraycopy(cs, c * dim, coarse, g * dim, dim)
    }
    val assignOf = new Array[Int](k)
    def assignAll(): Unit = {
      var c = 0
      while (c < k) {
        var best = 0
        var bestD = Long.MaxValue
        var g = 0
        while (g < nCoarse) {
          var acc = 0L
          var i = 0
          while (i < dim) {
            val diff = cs(c * dim + i) - coarse(g * dim + i)
            acc += diff * diff
            i += 1
          }
          if (acc < bestD) { bestD = acc; best = g }
          g += 1
        }
        assignOf(c) = best
        c += 1
      }
    }
    var it = 0
    while (it < coarseIters) {
      assignAll()
      val sums = new Array[Long](nCoarse * dim)
      val counts = new Array[Long](nCoarse)
      var c = 0
      while (c < k) {
        val g = assignOf(c)
        counts(g) += 1
        var i = 0
        while (i < dim) { sums(g * dim + i) += cs(c * dim + i); i += 1 }
        c += 1
      }
      var g = 0
      while (g < nCoarse) {
        if (counts(g) > 0) {
          var i = 0
          // truncating division — the corpus fit's negative-micro rule
          while (i < dim) {
            coarse(g * dim + i) = sums(g * dim + i) / counts(g); i += 1
          }
        } // empty cell keeps its center
        g += 1
      }
      it += 1
    }
    assignAll() // final membership under the final coarse centers
    val offsets = new Array[Int](nCoarse + 1)
    (0 until k).foreach(c => offsets(assignOf(c) + 1) += 1)
    (1 to nCoarse).foreach(g => offsets(g) += offsets(g - 1))
    val members = new Array[Int](k)
    val cursor = offsets.clone()
    var c = 0
    while (c < k) { // ascending c → ascending ids per cell
      members(cursor(assignOf(c))) = c
      cursor(assignOf(c)) += 1
      c += 1
    }
    TieredIndex(coarse, nCoarse, offsets, members)
  }

  /** LARGE-k assignment: two-level probe through [[tieredIndex]] —
    * O(nCoarse·dim + nProbe·(k/nCoarse)·dim) per row instead of the
    * exact [[assign]]'s O(k·dim) (at SemDeDup-paper scale, k ~ 10⁴-10⁵
    * cells, the exact scan IS the job — ScaleProbe `bigk`). Still ONE
    * codegen projection, no join, stream-safe. At nProbe = nCoarse
    * the result is bit-equal to [[assign]] (spec-held); at partial
    * probe the cluster is approximate but dist_micro2 is always the
    * exact distance to the returned cluster. */
  def assignTiered(emb: DataFrame, idCol: String, vecCol: String,
                   model: KmModel, nCoarse: Int, nProbe: Int,
                   coarseIters: Int = 5): DataFrame = {
    val idx = tieredIndex(model, nCoarse, coarseIters)
    emb.select(col(idCol).as("id"),
        microVec(col(vecCol)).as("vm"))
      .filter(size(col("vm")) === model.dim)
      .withColumn("nc", graft.functions.VectorExpressions
        .nearestCentroidTiered(col("vm"), model.centroids, model.k,
          model.dim, idx.coarse, idx.nCoarse, idx.memberOffsets,
          idx.members, nProbe))
      .filter(col("nc").isNotNull)
      .select(col("id"), col("nc.cluster").as("cluster"),
        col("nc.dist_micro2").as("dist_micro2"))
  }

  /** Assignment under a fitted model: (id, cluster, dist_micro2) —
    * one codegen projection, stream-safe (the frozen-scorer shape). */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
             model: KmModel): DataFrame =
    assignVm(emb.select(col(idCol).as("id"),
        microVec(col(vecCol)).as("vm"))
      .filter(size(col("vm")) === model.dim), model)
      .drop("vm")

  /** The packaged fit+assign: (id, cluster, dist_micro2) after
    * `iters` Lloyd rounds. */
  def fitAssign(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                dim: Int, iters: Int): DataFrame =
    assign(emb, idCol, vecCol, fit(emb, idCol, vecCol, k, dim, iters))

  /** SemDeDup with the corpus-fit clusters (Abbas et al. 2023's
    * actual recipe: k-means cells, exact cosine within a cell) —
    * near-duplicate pairs = same Lloyd cell AND cosine ≥ threshold.
    * Unlike [[Dedup.embeddingSemdedup]] (whose sample-trained MLlib
    * quantizer makes it rows-only), this variant's clustering is the
    * fully-replayable integer Lloyd, so the WHOLE semantic-dedup
    * pipeline — fit, assignment, blocking, cosine, threshold — is
    * oracle-checked end-to-end. Precision 1.0 (exact cosine); recall
    * = the co-located fraction, the SemDeDup trade. Work n²/cells; a
    * hot cell is a SELF-join skew AQE can never split (both sides
    * share the hot partition — hotcell probe), so the pair scan runs
    * through [[Dedup.blockedSelfPairs]]' triangular blocking on the
    * composite (cluster, block-pair) key. */
  def semdedupPairs(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int, dim: Int, iters: Int, threshold: Double,
                    nBlocks: Int = 16): DataFrame = {
    val model = fit(emb, idCol, vecCol, k, dim, iters)
    semdedupScan(emb, idCol, vecCol,
      graft.functions.VectorExpressions.nearestCentroid(
        microVec(col(vecCol)), model.centroids, model.k, model.dim),
      threshold, nBlocks)
  }

  /** [[semdedupPairs]] with the LARGE-k assignment tier: the
    * blocking cluster comes from [[assignTiered]]'s two-level probe
    * instead of the exact O(k·dim) argmin — at SemDeDup-paper k
    * (10⁴-10⁵ cells) the exact assignment IS the job (ScaleProbe
    * `bigk`). At nProbe = nCoarse the blocking is bit-equal to the
    * exact path, so the pair set is IDENTICAL (spec-held); at
    * partial probe a vector may block into a near-instead-of-nearest
    * cell, shifting which pairs co-locate — recall moves, but every
    * EMITTED pair still carries its exact cosine ≥ threshold
    * (precision 1.0 regardless of blocking, the SemDeDup trade
    * dialed one step further).
    *
    * MEASURED pair recall vs the exact-blocking pair set (ScaleProbe
    * `tierrecall`, ×10 corpus = 20k vecs, nCoarse = 64, thr 0.4):
    * k=1024 → 0.952 / 0.990 / 1.000 at nProbe 4 / 8 / 16;
    * k=4096 → 0.988 / 0.996 / 0.999 — with 0-1.4k EXTRA true
    * ≥-threshold pairs the exact blocking had split across cells,
    * and the pair-scan wall cut 2-3×. nProbe = 16 at nCoarse = 64
    * is the keep-the-recall default; the spec pins a 0.9 floor at
    * (k=32, nCoarse=8, nProbe=4) on the gate corpus (at 500 vecs
    * the exact pair set is 13 pairs — nProbe=2 there drops to 0.69,
    * the small-corpus tail the ×10 grid does not show). */
  def semdedupPairsTiered(emb: DataFrame, idCol: String, vecCol: String,
                          k: Int, dim: Int, iters: Int,
                          threshold: Double, nCoarse: Int, nProbe: Int,
                          nBlocks: Int = 16): DataFrame = {
    val model = fit(emb, idCol, vecCol, k, dim, iters)
    val idx = tieredIndex(model, nCoarse)
    semdedupScan(emb, idCol, vecCol,
      graft.functions.VectorExpressions.nearestCentroidTiered(
        microVec(col(vecCol)), model.centroids, model.k, model.dim,
        idx.coarse, idx.nCoarse, idx.memberOffsets, idx.members, nProbe),
      threshold, nBlocks)
  }

  /** The ONE cell-blocked exact-cosine pair scan both assignment
    * tiers feed: (cluster from `ncCol`) → triangular blocked
    * self-pairs → exact cosine → threshold. */
  private def semdedupScan(emb: DataFrame, idCol: String,
                           vecCol: String, ncCol: Column,
                           threshold: Double, nBlocks: Int): DataFrame = {
    import graft.functions.VectorExpressions.dotF
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
        sqrt(dotF(col(vecCol), col(vecCol))).as("nrm"),
        ncCol.as("nc"))
      .filter(col("nc").isNotNull)
      .select(col("id"), col("v"), col("nrm"),
        col("nc.cluster").as("cluster"))
    Dedup.roundedCosineAtLeast(
        Dedup.blockedSelfPairs(base, Seq("cluster"), nBlocks),
        dotF(col("va"), col("vb")) / (col("nrm_a") * col("nrm_b")),
        threshold)
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"),
        col("cluster"), col("cosine"))
  }

  /** IN-CONTEXT-PRETRAINING data order (Shi et al. 2023: packing
    * RELATED documents into the same training sequences beats random
    * order — the model learns cross-document reasoning): documents
    * are concatenated cluster-major (same Lloyd cell = semantically
    * related), centroid-distance-minor within the cell, id
    * tie-broken, then cut into `seqLen`-token bins by the exact
    * distributed running total ([[FeatureEng.packValues]] — no
    * global sort window).
    *
    * The order is ONE composite long — cluster·2^48 + min(dist_micro2
    * / 2^26, 2^20−1)·2^28 + id — so the existing single-column
    * prefix-sum machinery applies unchanged and the whole artifact
    * (fit, assignment, order, cut) replays in SQL. Contract: ids
    * must fit 28 bits (enforced in-plan via raise_error — re-key
    * larger corpora); the distance quantization only coarsens the
    * WITHIN-cell order (far tail ties broken by id), never cluster
    * adjacency. Max composite ≈ k·2^48 < 2^53, so the running
    * total's double-cast ordering stays exact.
    *
    * Output: (doc_id, cluster, n_tokens, bin, bin_offset) — which
    * training sequence each doc starts in and where; feed the same
    * order through packSegments for the boundary/mask artifact.
    */
  def inContextPack(docs: DataFrame, docIdCol: String, textCol: String,
                    emb: DataFrame, embIdCol: String, vecCol: String,
                    k: Int, dim: Int, iters: Int,
                    seqLen: Long): DataFrame = {
    // k·2^48 must stay under 2^53 for the running total's
    // double-cast ordering to be exact — the same enforced-contract
    // treatment as the 28-bit doc-id guard (silent Long/double drift
    // at larger k would corrupt bin assignments with no error).
    require(k >= 1 && k <= 32,
      s"inContextPack: k must be in [1, 32] (k*2^48 < 2^53 keeps the " +
        s"composite order exact in the prefix sum's double cast); got $k")
    packOrd(clusteredBase(docs, docIdCol, textCol, emb, embIdCol,
        vecCol, k, dim, iters)
        .withColumn("rid", col("doc_id")), seqLen)
      .withColumnRenamed("rid", "doc_id")
  }

  /** [[inContextPack]] for ARBITRARY-keyed corpora — lifts the
    * 28-bit id contract: the (doc, cluster, distance) base is keyed
    * through [[FeatureEng.md5DenseRank]] (dense [0, n) ranks in md5
    * order — any id type, no global sort), packed on the composite
    * order, and DECODED back to the original ids by a join on the
    * rank table. The clustering fit is IDENTICAL to the direct path
    * (the original ids seed the init — re-keying touches only the
    * packing key), so on corpora whose ids already satisfy the
    * 28-bit contract the output equals [[inContextPack]] whenever
    * the within-cell (cluster, quantized-distance) order is strict —
    * the id term is only a tie-break, and the two paths tie-break in
    * different (both deterministic) orders. The direct form with its
    * raise_error contract remains for compliant corpora (one join
    * cheaper). */
  def inContextPackRekeyed(docs: DataFrame, docIdCol: String,
                           textCol: String, emb: DataFrame,
                           embIdCol: String, vecCol: String,
                           k: Int, dim: Int, iters: Int, seqLen: Long,
                           rankBuckets: Int = 64): DataFrame = {
    require(k >= 1 && k <= 32,
      s"inContextPackRekeyed: k must be in [1, 32]; got $k")
    val base = clusteredBase(docs, docIdCol, textCol, emb, embIdCol,
      vecCol, k, dim, iters)
    val key = FeatureEng.md5DenseRank(base.select("doc_id"), "doc_id",
        rankBuckets)
      .withColumnRenamed("id", "doc_id")
      .localCheckpoint(false) // feeds the encode AND the decode join
    packOrd(base.join(key, "doc_id").drop("doc_id"), seqLen)
      .join(key, "rid").drop("rid")
      .select("doc_id", "cluster", "n_tokens", "bin", "bin_offset")
  }

  /** The shared (doc_id, n_tokens, cluster, dist_micro2) base both
    * packing forms consume — fit + assignment + the token-count
    * join, original ids untouched. */
  private def clusteredBase(docs: DataFrame, docIdCol: String,
                            textCol: String, emb: DataFrame,
                            embIdCol: String, vecCol: String,
                            k: Int, dim: Int, iters: Int): DataFrame = {
    val assigned = fitAssign(emb, embIdCol, vecCol, k, dim, iters)
      .select(col("id").as("doc_id"), col("cluster"),
        col("dist_micro2"))
    docs.select(col(docIdCol).as("doc_id"),
        size(graft.functions.Fns.words(col(textCol))).cast("long")
          .as("n_tokens"))
      .join(assigned, "doc_id")
  }

  /** The shared composite-order packing body: guard the 28-bit rank,
    * build ord = cluster·2^48 + distQ·2^28 + rid, cut by the exact
    * distributed running total, decode (rid, cluster) back out. */
  private def packOrd(base: DataFrame, seqLen: Long): DataFrame = {
    val guarded = base
      .withColumn("rid", when(col("rid") >= 0L &&
        col("rid") < (1L << 28),
        col("rid")).otherwise(expr(
        "raise_error('inContextPack: doc keys must fit 28 bits (non-negative) — re-key')")))
      .withColumn("ord",
        col("cluster").cast("long") * (1L << 48) +
          least(expr("dist_micro2 DIV 67108864"),
            lit((1L << 20) - 1)) * (1L << 28) +
          col("rid"))
    // packValues' doc_id column carries the composite ord — decode
    FeatureEng.packValues(guarded, "ord", "n_tokens", seqLen)
      .select(pmod(col("doc_id"), lit(1L << 28)).as("rid"),
        expr(s"doc_id DIV ${1L << 48}").cast("int").as("cluster"),
        col("n_tokens"), col("bin"), col("bin_offset"))
  }

  /** The dedup ACTION over [[semdedupPairs]]: keep-min — a vector
    * survives unless a smaller-id vector pairs with it at or above
    * `threshold` in its cell (the [[Dedup.embeddingKeepList]] drop
    * rule over the oracle-checked corpus-fit pairs). Returns the
    * surviving ids. No broadcast hint: on exactly the high-duplication
    * corpora SemDeDup targets, the distinct drop list scales with the
    * CORPUS (every duplicate is a doc_b), not with pairs per cell —
    * a forced broadcast would blow the driver there. AQE broadcasts
    * it when the runtime size qualifies and shuffles safely when it
    * doesn't. */
  def semdedupKeepList(emb: DataFrame, idCol: String, vecCol: String,
                       k: Int, dim: Int, iters: Int, threshold: Double,
                       nBlocks: Int = 16): DataFrame = {
    val drops = semdedupPairs(emb, idCol, vecCol, k, dim, iters,
        threshold, nBlocks)
      .select(col("doc_b").as(idCol)).distinct()
    emb.select(col(idCol))
      .join(drops, Seq(idCol), "left_anti")
  }

  private def kmTable(root: String) = s"$root/kmeans_model"

  /** PERSIST the fitted model under `root` as ONE atomic
    * VersionedStore table (`kmeans_model`: part, i, k, v — 'c' rows
    * carry (cluster, dim-index, centroid micro), 'meta' the (k, dim)
    * shape; single overwrite so a reader can never see centroids
    * from two fits — the refreshUnigram one-table contract). */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
                model: KmModel, root: String): Unit = {
    import spark.implicits._
    val rows = model.centroids.zipWithIndex.map { case (v, i) =>
      ("c", (i / model.dim).toLong, (i % model.dim).toLong, v)
    }.toSeq :+ ("meta", model.k.toLong, model.dim.toLong, 0L)
    graft.offline.VersionedStore.overwrite(
      rows.toDF("part", "i", "k", "v"), kmTable(root))
  }

  /** Load the persisted model — bit-equal to the [[saveModel]]
    * input (exact micros, one pinned snapshot). */
  def modelFromStore(spark: org.apache.spark.sql.SparkSession,
                     root: String): KmModel = {
    val t = graft.offline.VersionedStore.read(spark, kmTable(root))
      .localCheckpoint(false) // pin ONE snapshot for both parts
    val meta = t.filter(col("part") === "meta").select("i", "k").head()
    val k = meta.getLong(0).toInt
    val dim = meta.getLong(1).toInt
    val flat = new Array[Long](k * dim)
    t.filter(col("part") === "c").select("i", "k", "v").collect()
      .foreach(r =>
        flat(r.getLong(0).toInt * dim + r.getLong(1).toInt) = r.getLong(2))
    KmModel(k, dim, flat)
  }

  private def kmStatsTable(root: String) = s"$root/kmeans_stats"
  private def kmAppliedTable(root: String) = s"$root/kmeans_applied"

  /** Bootstrap the INCREMENTAL-REFRESH store (the Bpe.refreshVocab
    * precedent applied to k-means): persists the model plus an empty
    * (cluster, i) → (sv, n) sufficient-statistics table and the shard
    * ledger. Shards then fold in via [[upsertAssignStats]] (exactly
    * once), [[centroidDrift]] measures how far the accumulated
    * evidence has moved from the stored centroids, and
    * [[refreshCentroids]] applies one exact Lloyd step from the
    * store when the drift gate trips — no corpus rescan, the store
    * IS the corpus statistic (MacQueen-style online k-means, each
    * shard assigned under the model current at its ingest time). */
  def initRefreshStore(spark: org.apache.spark.sql.SparkSession,
                       model: KmModel, root: String): Unit = {
    import spark.implicits._
    saveModel(spark, model, root)
    graft.offline.VersionedStore.overwrite(
      Seq((0L, 0L, 0L, 0L)).toDF("cluster", "i", "sv", "n")
        .filter(lit(false)), kmStatsTable(root))
    graft.offline.VersionedStore.overwrite(
      Seq(("__init__", 0L, 0L, 0L, 0L))
        .toDF("shard_id", "cluster", "i", "sv", "n")
        .filter(lit(false)), kmShardStatsTable(root))
    graft.offline.VersionedStore.overwrite(
      Seq("__init__").toDF("shard_id"), kmAppliedTable(root))
  }

  private def kmShardStatsTable(root: String) = s"$root/kmeans_shard_stats"

  /** One shard's (cluster, i) → (sv, n) sufficient statistics under
    * `model` — the single derivation [[upsertAssignStats]] records
    * and [[retractAssignStats]] replays. */
  private def shardStats(shardEmb: DataFrame, idCol: String,
                         vecCol: String, model: KmModel): DataFrame =
    assignVm(vmProjection(shardEmb, idCol, vecCol, model.dim), model)
      .select(col("cluster"), posexplode(col("vm")).as(Seq("i", "v")))
      .groupBy(col("cluster").cast("long").as("cluster"),
        col("i").cast("long").as("i"))
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))

  /** Fold ONE shard's assignment statistics into the store: the
    * shard is assigned under the CURRENT stored model (one codegen
    * projection), reduced to (cluster, dim-index) → (component sum,
    * member count) — k·dim rows regardless of shard size — and
    * merged keyed EXACTLY-ONCE under the engine-wide
    * [[graft.offline.Ledger]] intent/done protocol. The shard's own
    * stat rows are RECORDED (keyed merge on (shard_id, cluster, i) —
    * idempotent, written before the ledger ingest so a crash replay
    * rewrites the same rows) so a later [[retractAssignStats]]
    * subtracts EXACTLY what was added even after refreshes have
    * moved the model. The recorded set is the FULL k·dim grid,
    * zero-filled for clusters the shard left empty: a crash between
    * the record merge and the ledger ingest followed by a
    * [[refreshCentroids]] means the replay re-assigns under a MOVED
    * model, whose stat rows can cover a different key subset — the
    * grid makes the replay overwrite every key, so no stale
    * first-attempt row can survive to poison a later retraction.
    * Returns whether the shard was applied.
    * Centroids are NOT moved here — call [[refreshCentroids]] on
    * whatever cadence suits. */
  def upsertAssignStats(shardEmb: DataFrame, idCol: String,
                        vecCol: String, root: String,
                        shardId: String): Boolean = {
    import graft.offline.Ledger
    val spark = shardEmb.sparkSession
    Ledger.requireFrameFree(shardId)
    if (Ledger.isApplied(spark, kmAppliedTable(root), shardId))
      return false
    val model = modelFromStore(spark, root)
    val grid = spark.range(model.k.toLong * model.dim)
      .select(expr(s"id DIV ${model.dim}").as("cluster"),
        pmod(col("id"), lit(model.dim.toLong)).as("i"))
    val stats = grid.join(
        shardStats(shardEmb, idCol, vecCol, model), Seq("cluster", "i"),
        "left_outer")
      .select(col("cluster"), col("i"),
        coalesce(col("sv"), lit(0L)).as("sv"),
        coalesce(col("n"), lit(0L)).as("n"))
      .localCheckpoint(false) // one computation for record + ingest
    graft.offline.VersionedStore.merge(
      stats.withColumn("shard_id", lit(shardId))
        .select("shard_id", "cluster", "i", "sv", "n"),
      kmShardStatsTable(root), Seq("shard_id", "cluster", "i"))
    Ledger.ingestOnce(spark, kmAppliedTable(root), kmStatsTable(root),
      Seq("cluster", "i"), Seq("sv", "n"), stats, shardId)
  }

  /** Retract one previously-ingested shard's statistics — the
    * right-to-be-forgotten path ([[graft.offline.Ledger.retractOnce]]):
    * the subtraction replays the RECORDED ingest-time rows (not a
    * re-assignment — the stored model may have moved since the
    * ingest), so sums and counts subtract exactly and a later
    * refresh fits evidence that never saw the shard. */
  def retractAssignStats(spark: org.apache.spark.sql.SparkSession,
                         root: String, shardId: String): Boolean = {
    import graft.offline.Ledger
    val recorded = graft.offline.VersionedStore
      .read(spark, kmShardStatsTable(root))
      .filter(col("shard_id") === shardId)
      .select("cluster", "i", "sv", "n")
    Ledger.retractOnce(spark, kmAppliedTable(root), kmStatsTable(root),
      Seq("cluster", "i"), Seq("sv", "n"), recorded, shardId)
  }

  /** The centroids the accumulated store evidence implies: sv/n with
    * the fit's truncating division; a (cluster, i) with no positive
    * count keeps the stored centroid. Driver-sized (k·dim rows). */
  private def impliedCentroids(spark: org.apache.spark.sql.SparkSession,
                               root: String, model: KmModel)
  : Array[Long] = {
    val next = model.centroids.clone()
    graft.offline.VersionedStore.read(spark, kmStatsTable(root))
      .filter(col("n") > 0)
      .select("cluster", "i", "sv", "n").collect()
      .foreach { r =>
        val c = r.getLong(0).toInt
        val i = r.getLong(1).toInt
        if (c >= 0 && c < model.k && i >= 0 && i < model.dim)
          next(c * model.dim + i) = r.getLong(2) / r.getLong(3)
      }
    next
  }

  /** Centroid-shift drift between the stored model and the store
    * evidence: micro-L1 of (implied − stored) normalized by the
    * stored centroids' micro-L1 mass (floor 1 — an all-zero model
    * still reports). 0 right after a refresh (the refresh SETS the
    * centroids to the implied values); grows as shards whose
    * vectors pull the cells arrive. */
  def centroidDrift(spark: org.apache.spark.sql.SparkSession,
                    root: String): Double = {
    val model = modelFromStore(spark, root)
    val implied = impliedCentroids(spark, root, model)
    var l1 = 0L
    var mass = 0L
    var i = 0
    while (i < implied.length) {
      l1 += math.abs(implied(i) - model.centroids(i))
      mass += math.abs(model.centroids(i))
      i += 1
    }
    l1.toDouble / math.max(mass, 1L)
  }

  final case class KmRefresh(drift: Double, retrained: Boolean,
                             model: KmModel)

  /** Retrain-vs-keep: measure [[centroidDrift]]; above `maxDrift`,
    * apply ONE exact Lloyd step from the STORED statistics (no
    * corpus scan) and re-persist the model atomically; otherwise
    * keep serving the current one. Old model versions stay readable
    * (copy-on-write overwrite), so in-flight assignments are
    * unaffected. After a retrain the drift is exactly 0 — the
    * centroids now equal the evidence. */
  def refreshCentroids(spark: org.apache.spark.sql.SparkSession,
                       root: String, maxDrift: Double = 0.05)
  : KmRefresh = {
    val model = modelFromStore(spark, root)
    val drift = centroidDrift(spark, root)
    if (drift > maxDrift) {
      val next = KmModel(model.k, model.dim,
        impliedCentroids(spark, root, model))
      saveModel(spark, next, root)
      KmRefresh(drift, retrained = true, next)
    } else KmRefresh(drift, retrained = false, model)
  }

  /** CLUSTER-BALANCED corpus: flatten topic skew by sampling every
    * k-means cell to a uniform token share — [[FeatureEng.domainMix]]'s
    * rate machinery (largest achievable corpus, basis-point rates,
    * md5-bucket determinism) with the learned cluster as the domain.
    * `docs` joins `emb` on id (broadcast-eligible rate table; the
    * cluster column rides the one equi-join). */
  def clusterBalance(docs: DataFrame, docIdCol: String, textCol: String,
                     emb: DataFrame, embIdCol: String, vecCol: String,
                     k: Int, dim: Int, iters: Int): DataFrame = {
    val clusters = fitAssign(emb, embIdCol, vecCol, k, dim, iters)
      .select(col("id").as("doc_id"), col("cluster"))
    // the cluster IS the source (no string round-trip): uniform
    // shares through THE shared rate machinery
    val base = docs.select(col(docIdCol).as("doc_id"),
        col(textCol).as("text"))
      .join(clusters, "doc_id")
      .select(col("doc_id"), col("cluster").as("source"),
        size(graft.functions.Fns.words(col("text"))).cast("long")
          .as("n_tokens"))
    val perSrc = base.groupBy("source")
      .agg(sum("n_tokens").as("src_tokens"))
      .withColumn("share", lit(1.0))
    FeatureEng.mixApply(base, FeatureEng.mixRates(perSrc),
        Seq("doc_id", "source", "n_tokens", "sample_bucket", "rate_bp"))
      .withColumnRenamed("source", "cluster")
  }
}
