package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three paths:
  *  - bruteTopK: exact cosine top-k for a SMALL query set — the query
  *    side is broadcast so the corpus never shuffles; per-partition
  *    cosine + a window ranked within each query id.
  *  - lshTopK: random-hyperplane LSH — both sides bucketed by sign
  *    bits, candidates generated per bucket only. The scale path: at
  *    100 TB the bucket join replaces the corpus×queries cross
  *    product with |bucket| joins.
  *  - ivfTopK: IVF with a k-means coarse quantizer — corpus sharded
  *    by nearest centroid, queries probe their nProbe nearest cells.
  *    Better recall/compute trade than LSH when the data is
  *    clustered; recall tunable via nProbe.
  */
object Ann {

  /** Deterministic pseudo-random hyperplane component in [-1, 1] —
    * md5-derived like the reference's hash family, no RNG state so
    * every executor regenerates identical planes.
    */
  private[graft] def planeComponent(j: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane_${j}_$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    (java.lang.Long.parseLong(hex, 16) % 2001L - 1000L) / 1000.0
  }

  /** Shared scan-and-rank scaffold for the brute-force paths: queries
    * broadcast against the (float or quantized) corpus, cosine from
    * `cosRaw`, per-query row_number top-k with the id tie-break. One
    * definition so a change to ranking/rounding can never drift
    * between the float and SQ8 variants.
    */
  private def rankByCosine(q: DataFrame, c: DataFrame,
                           cosRaw: Column, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_raw", cosRaw)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_raw"), 6).as("cosine"), col("rank"))
  }

  /** Exact cosine top-k: `queries` broadcast against `corpus`. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    import graft.functions.VectorExpressions.dotF
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Fns.l2Norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      Fns.l2Norm(col(vecCol)).as("cn"))
    rankByCosine(q, c,
      dotF(col("qv"), col("cv")) / (col("qn") * col("cn")), k)
  }

  /** HARD-NEGATIVE MINING for contrastive training data: for each
    * query vector, the k most-cosine-similar corpus vectors with a
    * DIFFERENT label — the "close but wrong" examples a contrastive
    * or reranker objective needs. Same broadcast-queries shape as
    * [[bruteTopK]] (the corpus never shuffles) with the label
    * mismatch pushed into the join condition, so same-label pairs are
    * pruned before any ranking work. At corpus-as-queries scale,
    * route candidates through the IVF index ([[ivfSearch]]) and
    * apply the same label filter to its candidate set.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    import graft.functions.VectorExpressions.dotF
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("query_label"), col(vecCol).as("qv"),
      Fns.l2Norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("neighbor_label"), col(vecCol).as("cv"),
      Fns.l2Norm(col(vecCol)).as("cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id") &&
        col("query_label") =!= col("neighbor_label"))
      .withColumn("cos_raw", dotF(col("qv"), col("cv")) /
        (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"), round(col("cos_raw"), 6).as("cosine"),
        col("rank"))
  }

  /** kNN LABEL AGREEMENT (confident-learning-style noise detection):
    * for each query vector, the fraction of its k nearest corpus
    * neighbors (self excluded) that share its label — rows with low
    * agreement are mislabel/outlier candidates a curation pass
    * reviews or drops. The agreement mean is a sum of exact 0/1
    * doubles over ≤ k values, so it is order-independent.
    * [[bruteTopK]] shape; scale path as [[hardNegatives]].
    */
  def knnLabelAgreement(corpus: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, labelCol: String,
                        k: Int): DataFrame = {
    import graft.functions.VectorExpressions.dotF
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("query_label"), col(vecCol).as("qv"),
      Fns.l2Norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("neighbor_label"), col(vecCol).as("cv"),
      Fns.l2Norm(col(vecCol)).as("cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_raw", dotF(col("qv"), col("cv")) /
        (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .groupBy(col("query_id"), col("query_label").as("label"))
      .agg(count(lit(1)).as("n_neighbors"),
        round(avg(when(col("query_label") === col("neighbor_label"), 1.0)
          .otherwise(0.0)), 6).as("agreement"))
  }

  /** SEMANTIC decontamination: flag corpus documents whose embedding
    * is cosine-close (>= `threshold`) to ANY held-out eval embedding —
    * the vector-space companion to [[Dedup.decontaminate]]'s n-gram
    * gate, catching paraphrased eval leakage that shares no shingles
    * with the benchmark text. Returns (doc_id, n_close, max_cos) for
    * flagged corpus rows; anti-join the corpus against it to scrub.
    * Cosines are rounded to 6dp BEFORE thresholding and max, so the
    * boundary decision is bit-deterministic across engines.
    *
    * Same asymmetric scale shape as the shingle gate: eval sets are
    * small (thousands of vectors), so the eval side broadcasts and
    * the corpus scores map-side — it never shuffles until the per-doc
    * aggregate, which only carries flagged rows. The corpus×eval dot
    * products ARE the work; at corpus-as-queries scale with a LARGE
    * eval set, build a persisted IVF index over the eval vectors and
    * probe it corpus-side ([[hardNegativesIvf]]'s shape) to prune the
    * candidate set. Caller supplies disjoint frames; ids are not
    * cross-excluded here.
    */
  def semanticDecontam(corpus: DataFrame, evalVecs: DataFrame,
                       idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    import graft.functions.VectorExpressions.dotF
    // zero-norm guard: a dead/padded all-zero vector has cos = 0/0 =
    // NaN, and Spark orders NaN above every number — it would be
    // flagged against the ENTIRE eval set with max_cos = NaN
    val e = evalVecs.select(col(idCol).as("eval_id"), col(vecCol).as("ev"),
        Fns.l2Norm(col(vecCol)).as("en"))
      .filter(col("en") > 0)
    val c = corpus.select(col(idCol).as("doc_id"), col(vecCol).as("cv"),
        Fns.l2Norm(col(vecCol)).as("cn"))
      .filter(col("cn") > 0)
    c.join(broadcast(e))
      .withColumn("cos",
        round(dotF(col("cv"), col("ev")) / (col("cn") * col("en")), 6))
      .filter(col("cos") >= threshold)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_close"), max(col("cos")).as("max_cos"))
  }

  /** Per-dimension SQ8 quantization grid (see functions.Sq8Encode). */
  case class Sq8Params(mins: Array[Double], scales: Array[Double]) {
    def dim: Int = mins.length
  }

  /** Train the SQ8 grid: per-dimension [min, max] over the corpus.
    * One explode + map-side-combining aggregate keyed by the `dim`
    * positions — O(dim) result rows regardless of corpus size.
    */
  def sq8Train(emb: DataFrame, vecCol: String): Sq8Params = {
    val rows = emb.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .filter(col("x").isNotNull)
      .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
      .collect()
    require(rows.nonEmpty, "cannot train SQ8 on an empty corpus")
    val dim = rows.iterator.map(_.getInt(0)).max + 1
    val mins = new Array[Double](dim)
    val scales = new Array[Double](dim)
    rows.foreach { r =>
      val p = r.getInt(0)
      mins(p) = r.getFloat(1).toDouble
      scales(p) = (r.getFloat(2).toDouble - r.getFloat(1).toDouble) / 255.0
    }
    Sq8Params(mins, scales)
  }

  /** Quantized exact-scan top-k: the corpus is SQ8-encoded (one byte
    * per dimension — 4× less memory and scan I/O than float32, the
    * lever that matters when the corpus IS the 100 TB), queries stay
    * float, and ranking uses the fused asymmetric dot (query ·
    * dequantized code, no float array materialized per pair). Same
    * plan shape as [[bruteTopK]]: queries broadcast, corpus never
    * shuffles. Recall loss is bounded by the grid step (≤ half a
    * scale unit per dimension); ranks of vectors closer than the
    * quantization noise may swap — spec-measured recall ≥ 0.9 @ 10
    * on the test corpus.
    */
  def bruteTopKSq8(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int,
                   params: Option[Sq8Params] = None): DataFrame = {
    import graft.functions.VectorExpressions
    val p = params.getOrElse(sq8Train(corpus, vecCol))
    val c = corpus.select(col(idCol).as("neighbor_id"),
        VectorExpressions.sq8Encode(col(vecCol), p.mins, p.scales)
          .as("code"))
      .withColumn("cn",
        VectorExpressions.sq8Norm(col("code"), p.mins, p.scales))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Fns.l2Norm(col(vecCol)).as("qn"))
    rankByCosine(q, c,
      VectorExpressions.sq8Dot(col("qv"), col("code"), p.mins, p.scales) /
        (col("qn") * col("cn")), k)
  }

  /** Product-quantization codebooks (see functions.PqEncode): `m`
    * subspaces × `k` centroids × `dsub` dims, flattened. One BYTE per
    * subspace per vector — dim·4/m× less memory and scan I/O than
    * float32 (32× at dim 64, m 8), the compression tier below SQ8
    * (4×) on the brute → SQ8 → PQ ladder. */
  case class PqParams(m: Int, k: Int, dsub: Int, codebook: Array[Float]) {
    def dim: Int = m * dsub
  }

  /** Train PQ codebooks: per-subspace Lloyd k-means over a
    * DETERMINISTIC bounded sample (global ascending-id head — the
    * cellIndex convention), run on the driver. Like the SQ8 grid and
    * the DSIR model, the codebook is a driver-bounded artifact
    * (m·k·dsub floats); only encode and serve are distributed. Init
    * is evenly-spaced sample points in id order and ties take the
    * lowest centroid — fully reproducible, no RNG.
    */
  def pqTrain(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
              m: Int, k: Int, trainSample: Int = 65536,
              iters: Int = 10): PqParams = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    require(k >= 1 && k <= 256, "PQ codes are one byte per subspace")
    val dsub = dim / m
    val sample = emb.orderBy(col(idCol)).limit(trainSample)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).padTo(dim, 0f).toArray)
    require(sample.nonEmpty, "cannot train PQ on an empty corpus")
    val codebook = new Array[Float](m * k * dsub)
    var j = 0
    while (j < m) {
      val pts = sample.map(v => java.util.Arrays.copyOfRange(
        v, j * dsub, (j + 1) * dsub))
      val centers = lloyd(pts, k, iters)
      var c = 0
      while (c < k) {
        System.arraycopy(centers(c), 0, codebook, (j * k + c) * dsub, dsub)
        c += 1
      }
      j += 1
    }
    PqParams(m, k, dsub, codebook)
  }

  private def lloyd(pts: Array[Array[Float]], k: Int, iters: Int)
  : Array[Array[Float]] = {
    val n = pts.length
    val d = pts(0).length
    // evenly-spaced deterministic init (sample is id-ordered)
    val centers = Array.tabulate(k)(c =>
      pts(((c.toLong * n) / k).toInt).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Long](k)
      var i = 0
      while (i < n) {
        val p = pts(i)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var dist = 0.0
          var t = 0
          while (t < d) {
            val diff = p(t).toDouble - centers(c)(t)
            dist += diff * diff
            t += 1
          }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        val s = sums(best)
        var t = 0
        while (t < d) { s(t) += p(t); t += 1 }
        counts(best) += 1
        i += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var t = 0
          while (t < d) {
            centers(c)(t) = (sums(c)(t) / counts(c)).toFloat
            t += 1
          }
        } // empty cluster keeps its center — deterministic
        c += 1
      }
      it += 1
    }
    centers
  }

  /** PQ-compressed exact-scan top-k: the corpus holds m bytes per
    * vector, queries stay float, ranking uses the fused asymmetric
    * (ADC) dot against the reconstruction — same plan shape as
    * [[bruteTopKSq8]] (queries broadcast, corpus never shuffles), one
    * compression tier deeper. Recall trades with m·k; spec-measured
    * on the test corpus. The cosine denominator uses the stored
    * reconstruction norm, so scoring touches only bytes + the
    * broadcast codebook.
    */
  def bruteTopKPq(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int, params: PqParams): DataFrame = {
    import graft.functions.VectorExpressions
    val p = params
    val c = corpus.select(col(idCol).as("neighbor_id"),
        VectorExpressions.pqEncode(col(vecCol), p.codebook, p.m, p.k,
          p.dsub).as("code"))
      .withColumn("cn",
        VectorExpressions.pqNorm(col("code"), p.codebook, p.m, p.k, p.dsub))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Fns.l2Norm(col(vecCol)).as("qn"))
    rankByCosine(q, c,
      VectorExpressions.pqAdcDot(col("qv"), col("code"), p.codebook,
        p.m, p.k, p.dsub) / (col("qn") * col("cn")), k)
  }

  /** Sign-bit bucket id from `nPlanes` deterministic hyperplanes.
    * `planeOffset` selects a disjoint plane family, so multi-table
    * LSH callers get independent tables from the same hash scheme.
    *
    * Computed by the codegen'd PlaneSignBucket expression: one tight
    * loop over all planes per row, instead of nPlanes interpreted
    * `aggregate(zip_with(...))` folds (HigherOrderFunctions are
    * CodegenFallback — at 128 planes per row in multi-table callers
    * the interpretation dominated candidate generation). Accumulation
    * order matches the fold exactly, so bucket ids are unchanged.
    */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int,
                planeOffset: Int = 0): Column = {
    val flat = Array.tabulate(nPlanes * dim)(idx =>
      planeComponent(idx / dim + planeOffset, idx % dim))
    graft.functions.VectorExpressions.planeSigns(vec, flat, nPlanes, dim)
  }

  /** IVF (inverted-file) self-ANN: a k-means coarse quantizer shards
    * the corpus into cells; each query probes its `nProbe` nearest
    * cells only. The centroid table is tiny (k rows) → broadcast; the
    * corpus is touched once for assignment and once per probe join.
    * Training samples at most `trainSample` rows — at 100 TB the
    * quantizer never sees the full corpus.
    */
  /** One trained IVF index: the coarse quantizer plus the assigned
    * corpus (cell + norm per vector, persisted — the materialized
    * inverted file). */
  private[operators] case class IvfIndex(
    model: org.apache.spark.ml.clustering.KMeansModel,
    assigned: DataFrame)

  /** Index cache: a deployment trains the coarse quantizer once and
    * serves many queries against it — keyed by the input plan's
    * semantic hash + nCentroids + trainSample, so identical plans
    * reuse the model AND the materialized corpus assignment (the
    * expensive per-call piece: without it every search re-scans the
    * corpus, re-predicts every cell, and re-checkpoints) while
    * different data or training configs rebuild. Bounded LRU
    * (access-order, 32 entries, eldest evicted and its cached blocks
    * unpersisted — never a full clear). The assignment is persist()ed,
    * not checkpointed: lineage survives, so an executor loss (or a
    * dynamic-allocation decommission) just recomputes the lost blocks
    * instead of failing every later search against the entry with
    * missing-checkpoint-block errors. NOTE the key is the PLAN, not
    * the data:
    * overwriting the same source path in place keeps the plan hash —
    * call clearQuantizerCache() after rewriting a corpus under the
    * same path.
    */
  /** LRU capacity — var (not final) so specs can shrink it to exercise
    * eviction without 32 real k-means trainings. */
  @volatile private[graft] var maxCacheEntries: Int = 32

  private val quantizers =
    new java.util.LinkedHashMap[(Int, Int, Int), IvfIndex](16, 0.75f, true) {
      override def removeEldestEntry(
        e: java.util.Map.Entry[(Int, Int, Int), IvfIndex]): Boolean = {
        val evict = size > maxCacheEntries
        if (evict) e.getValue.assigned.unpersist(blocking = false)
        evict
      }
    }

  /** Cached corpus assignments, eldest first (test hook: lets specs
    * assert cache size and that live entries stay persisted). */
  private[graft] def cachedAssignments: Seq[DataFrame] =
    quantizers.synchronized {
      import scala.jdk.CollectionConverters._
      quantizers.values.asScala.map(_.assigned).toSeq
    }

  /** Drop all cached IVF quantizers (use after rewriting a corpus in
    * place, which keeps the logical-plan cache key unchanged). */
  def clearQuantizerCache(): Unit =
    quantizers.synchronized {
      quantizers.values.forEach(ix =>
        ix.assigned.unpersist(blocking = false))
      quantizers.clear()
    }

  /** Number of k-means trainings actually run (cache misses) — lets
    * specs assert that repeated searches over the same plan reuse the
    * quantizer instead of silently retraining. */
  private[graft] val quantizerTrainings =
    new java.util.concurrent.atomic.AtomicLong(0)

  /** Self-ANN over one table: every vector queries the rest. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              nCentroids: Int, nProbe: Int, k: Int,
              trainSample: Int = 100000): DataFrame =
    ivfSearch(emb, emb, idCol, vecCol, nCentroids, nProbe, k, trainSample)

  /** IVF search of `queries` against `corpus` (the serving shape: a
    * small query batch probing a big indexed corpus). The quantizer
    * trains on the CORPUS sample; the corpus is assigned once and
    * persisted (MEMORY_AND_DISK — at serving scale this is the
    * precomputed index); queries only rank the broadcast centroid
    * table and join their nProbe cells.
    *
    * @param excludeSelf drop corpus rows whose id equals the query id
    *   (bruteTopK parity — right when queries are drawn from the
    *   corpus). Set false when the two tables have UNRELATED id
    *   spaces: an accidental id match would silently drop a true
    *   neighbor.
    */
  /** Train-or-reuse the coarse quantizer plus the persisted corpus
    * cell assignment (id, v, cell, nrm) — the shared substrate of
    * [[ivfSearch]] and Dedup.embeddingSemdedup, cached by corpus plan
    * hash (see the cache scaladoc above).
    */
  private[operators] def cellIndex(corpus: DataFrame, idCol: String,
                                   vecCol: String, nCentroids: Int,
                                   trainSample: Int): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("fv", array_to_vector(col("v")))
    val cacheKey =
      (corpus.queryExecution.logical.semanticHash(), nCentroids, trainSample)
    val cached = quantizers.synchronized { quantizers.get(cacheKey) }
    if (cached != null) cached else {
      quantizerTrainings.incrementAndGet()
      // Deterministic training sample: global ascending-id head, not
      // an arbitrary-partition limit() (TakeOrdered — distributed).
      val trained = new KMeans().setK(nCentroids).setSeed(42L)
        .setFeaturesCol("fv").setPredictionCol("cell")
        .fit(base.orderBy("id").limit(trainSample))
      // Corpus assignment (KMeans transform + norm) is the IVF
      // index — persist() materializes it at first action, and
      // caching it WITH the model means repeated searches pay zero
      // corpus re-scans/re-predictions (the dominant steady-state
      // cost when only the model was cached). persist, NOT
      // localCheckpoint: a long-lived cache entry must survive
      // executor loss, which checkpointed (lineage-truncated) blocks
      // cannot — they fail unrecoverably until a manual cache clear.
      val assigned = trained.transform(base).drop("fv")
        .withColumn("nrm", Fns.l2Norm(col("v")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val built = IvfIndex(trained, assigned)
      // Double-checked put: a concurrent miss on the same key may have
      // trained and persisted its own index while we were outside the
      // lock. Persisted plans are held strongly by CacheManager until
      // explicit unpersist (unlike checkpoint blocks, which the
      // ContextCleaner reclaims), so the losing build must unpersist
      // or its blocks leak for the life of the serving process.
      quantizers.synchronized {
        val winner = quantizers.get(cacheKey)
        if (winner != null) {
          built.assigned.unpersist(blocking = false)
          winner
        } else {
          quantizers.put(cacheKey, built)
          built
        }
      }
    }
  }

  def ivfSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, nCentroids: Int, nProbe: Int, k: Int,
                trainSample: Int = 100000,
                excludeSelf: Boolean = true): DataFrame = {
    import graft.functions.VectorExpressions.dotF
    val spark = corpus.sparkSession
    val index = cellIndex(corpus, idCol, vecCol, nCentroids, trainSample)
    val model = index.model
    val assigned = index.assigned

    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }
    val centroidDf = spark.createDataFrame(centroids.toSeq)
      .toDF("c_cell", "cv")
      .withColumn("cnrm", Fns.l2Norm(col("cv")))

    // nProbe nearest cells per query by L2 == max (dot - |c|²/2).
    // Self-ANN reuses the persisted corpus assignment — a separate
    // query plan would re-scan the corpus and recompute every norm.
    val qBase =
      if (queries eq corpus) assigned.drop("cell")
      else queries.select(col(idCol).as("id"), col(vecCol).as("v"))
        .withColumn("nrm", Fns.l2Norm(col("v")))
    probeAndRank(qBase, centroidDf, assigned, nProbe, k, excludeSelf)
  }

  /** IVF search against EXPLICIT centroid vectors — no k-means, no
    * training sample: `centroids` carries (c_cell, cv) and both the
    * corpus assignment and the probe stage are the same closed-form
    * L2-argmin arithmetic as the trained path. Two uses: (a) serving
    * against externally-supplied centroids (a quantizer trained
    * elsewhere, or domain-defined anchors), and (b) the
    * oracle-checkable IVF recall audit — with deterministic seed
    * centroids every stage is plain vector arithmetic, so an
    * independent SQL engine can replay assignment, probing, ranking,
    * and the recall metrics exactly (q_ann_ivf_recall), which the
    * k-means path cannot offer. Same cell-restricted join shape as
    * [[ivfSearch]]: recall is what the probe trades, and this entry
    * is how that trade gets MEASURED.
    */
  def ivfSearchSeeded(corpus: DataFrame, queries: DataFrame,
                      idCol: String, vecCol: String,
                      centroids: DataFrame, nProbe: Int, k: Int,
                      excludeSelf: Boolean = true): DataFrame = {
    val centroidDf = centroids.select(col("c_cell"), col("cv"))
      .withColumn("cnrm", Fns.l2Norm(col("cv")))
    val assigned = assignToCentroids(corpus, idCol, vecCol, centroidDf)
      .withColumn("nrm", Fns.l2Norm(col("v")))
    val qBase = queries.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Fns.l2Norm(col("v")))
    probeAndRank(qBase, centroidDf, assigned, nProbe, k, excludeSelf)
  }

  /** The IVF query stage, shared by the in-memory and persisted-index
    * paths: each query ranks the broadcast centroid table to pick its
    * `nProbe` cells (L2 argmin == argmax of dot − |c|²/2), joins its
    * cells' corpus vectors, and keeps the cosine top-k. `qBase` must
    * carry (id, v, nrm); `centroidDf` (c_cell, cv, cnrm); `assigned`
    * (id, v, cell, nrm).
    */
  private def probeAndRank(qBase: DataFrame, centroidDf: DataFrame,
                           assigned: DataFrame, nProbe: Int, k: Int,
                           excludeSelf: Boolean): DataFrame = {
    import graft.functions.VectorExpressions.dotF
    probeAndRankOn(qBase, centroidDf,
      assigned.select(col("id").as("neighbor_id"), col("v").as("cv2"),
        col("nrm").as("cn"), col("cell")),
      dotF(col("qv"), col("cv2")) / (col("qn") * col("cn")),
      nProbe, k, excludeSelf)
  }

  /** probeAndRank generalized over the corpus payload: `corpusSide`
    * must carry (neighbor_id, cell, cn, <payload>), and `cosRaw`
    * computes the raw cosine from (qv, qn, cn, payload) — float
    * vectors and SQ8 codes share every other line of the query path.
    */
  private def probeAndRankOn(qBase: DataFrame, centroidDf: DataFrame,
                             corpusSide: DataFrame, cosRaw: Column,
                             nProbe: Int, k: Int,
                             excludeSelf: Boolean): DataFrame =
    rankStage(probeStage(qBase, centroidDf, nProbe), corpusSide, cosRaw,
      k, excludeSelf)

  /** The probe half: each query ranks the broadcast centroid table and
    * keeps its `nProbe` cells (L2 argmin == argmax of dot − |c|²/2,
    * ties to the lowest cell). Returns (query_id, qv, qn, cell). Split
    * out so the persisted-index serve path can materialize it once,
    * collect the distinct probed-cell set for storage-level file
    * pruning, and then rank against only those cells' files.
    */
  private def probeStage(qBase: DataFrame, centroidDf: DataFrame,
                         nProbe: Int): DataFrame = {
    import graft.functions.VectorExpressions.dotF
    val wProbe = Window.partitionBy("id").orderBy(
      (dotF(col("v"), col("cv")) - col("cnrm") * col("cnrm") / 2).desc,
      col("c_cell"))
    qBase.crossJoin(broadcast(centroidDf))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nProbe)
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("c_cell").as("cell"))
  }

  /** The rank half: probes (query_id, qv, qn, cell) equi-join their
    * cells' corpus rows, cosine top-k per query. */
  private def rankStage(probes: DataFrame, corpusSide: DataFrame,
                        cosRaw: Column, k: Int,
                        excludeSelf: Boolean): DataFrame = {
    val wk = Window.partitionBy("query_id")
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    val hits = probes.join(corpusSide, Seq("cell"))
    val candidates =
      if (excludeSelf) hits.filter(col("query_id") =!= col("neighbor_id"))
      else hits
    candidates
      .withColumn("cos_raw", cosRaw)
      .withColumn("rank", row_number().over(wk).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_raw"), 6).as("cosine"), col("rank"))
  }

  // --- persisted IVF index (serving) ---------------------------------

  private[operators] def centroidTable(indexRoot: String) = s"$indexRoot/centroids"
  private[operators] def assignmentTable(indexRoot: String) = s"$indexRoot/assignment"

  /** Train an IVF index and PERSIST it as two VersionedStore tables
    * under `indexRoot`: `centroids` (c_cell, cv) and `assignment`
    * (id, v, cell, nrm — the inverted file). The in-JVM cache dies
    * with the session; a persisted index is the serving shape
    * (reference OnlineServingService.java batch lookup): any later
    * job [[ivfServe]]s against it without retraining or re-assigning
    * the corpus, and refreshes ride [[ivfIndexUpsert]] (a keyed
    * MERGE) instead of a rebuild. Rebuilding in place is an
    * overwrite — both tables stay time-travelable.
    */
  def ivfBuildIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    nCentroids: Int, indexRoot: String,
                    trainSample: Int = 100000): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import graft.offline.VersionedStore
    val spark = corpus.sparkSession
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("fv", array_to_vector(col("v")))
    quantizerTrainings.incrementAndGet()
    val trained = new KMeans().setK(nCentroids).setSeed(42L)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(base.orderBy("id").limit(trainSample))
    val assigned = trained.transform(base).drop("fv")
      .withColumn("nrm", Fns.l2Norm(col("v")))
    val centroids = trained.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }
    VersionedStore.overwrite(
      spark.createDataFrame(centroids.toSeq).toDF("c_cell", "cv"),
      centroidTable(indexRoot))
    // Lay the inverted file into disjoint cell ranges (~1 cell/file)
    // in the FIRST commit — a serve probing nProbe cells then opens
    // ~nProbe files via manifest stats instead of scanning the table.
    // Sorted at write time, not via a post-hoc compact: at inverted-
    // file scale a second rewrite pass doubles the build I/O.
    VersionedStore.overwrite(
      assigned.repartitionByRange(nCentroids, col("cell"))
        .sortWithinPartitions("cell"),
      assignmentTable(indexRoot))
  }

  /** Re-sort a persisted index's inverted file by cell. Build already
    * does this; [[ivfIndexUpsert]] MERGEs write files spanning many
    * cells (wide footer [min, max] → never pruned), so serve-side
    * file pruning degrades as upserts accumulate — run this
    * periodically to restore ~1-file-per-cell layout. Both index
    * variants (float and SQ8) accepted via `sq8`.
    */
  def ivfIndexCompact(spark: org.apache.spark.sql.SparkSession,
                      indexRoot: String, nFiles: Int,
                      sq8: Boolean = false): Long = {
    import graft.offline.VersionedStore
    val table = if (sq8) sq8AssignmentTable(indexRoot)
                else assignmentTable(indexRoot)
    VersionedStore.compact(spark, table, numFiles = nFiles,
      sortBy = Seq("cell"))
  }

  /** Collect the distinct probed-cell set (bounded by nCentroids — a
    * small driver scalar, like the SQ8 grid reads) and materialize the
    * probes once: localCheckpoint so the probe stage's upstream query
    * plan runs a single time even though probes feed both the cell
    * collect and the rank join.
    */
  private def probedCellsAndProbes(qBase: DataFrame, centroidDf: DataFrame,
                                   nProbe: Int): (Seq[Double], DataFrame) = {
    val probes = probeStage(qBase, centroidDf, nProbe).localCheckpoint()
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0).toDouble).toSeq
    (cells, probes)
  }

  /** Serve ANN queries from a PERSISTED index (built by
    * [[ivfBuildIndex]]): no training, and no corpus scan beyond the
    * probed cells — the centroid table (k rows) broadcasts, and the
    * inverted-file read is pruned at the FILE level to the query
    * batch's probed cell set ([[graft.offline.VersionedStore.readValues]]
    * over the cell-sorted layout the build commits), so a batch
    * probing nProbe of nCentroids cells opens ~that fraction of the
    * files — the batch multi-get serving shape (reference
    * OnlineServingService.java), not a table scan. Result contract
    * matches [[ivfSearch]] exactly (same probe ordering, cosine,
    * tie-breaks).
    *
    * `excludeSelf` defaults to FALSE: served queries usually come
    * from an id space unrelated to the corpus, where an accidental
    * query_id == corpus id collision must not drop a true neighbor.
    * Pass true when queries are drawn from the indexed corpus.
    */
  def ivfServe(spark: org.apache.spark.sql.SparkSession, indexRoot: String,
               queries: DataFrame, idCol: String, vecCol: String,
               nProbe: Int, k: Int, excludeSelf: Boolean = false)
  : DataFrame = {
    import graft.functions.VectorExpressions.dotF
    import graft.offline.VersionedStore
    val centroidDf = VersionedStore.read(spark, centroidTable(indexRoot))
      .withColumn("cnrm", Fns.l2Norm(col("cv")))
    val qBase = queries.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Fns.l2Norm(col("v")))
    val (cells, probes) = probedCellsAndProbes(qBase, centroidDf, nProbe)
    val assigned = VersionedStore.readValues(spark,
      assignmentTable(indexRoot), "cell", cells)
    rankStage(probes,
      assigned.select(col("id").as("neighbor_id"), col("v").as("cv2"),
        col("nrm").as("cn"), col("cell")),
      dotF(col("qv"), col("cv2")) / (col("qn") * col("cn")),
      k, excludeSelf)
  }

  /** IVF-served HARD NEGATIVES — the corpus-as-queries scale path for
    * [[hardNegatives]]: candidates come from the persisted index's
    * probed cells (an [[ivfServe]] over-fetch of `kCand`), the label
    * table joins onto that bounded candidate set (the candidate side
    * broadcasts — |queries|·kCand rows — so the corpus-sized label
    * table never shuffles), and the different-label survivors re-rank
    * to top-k. Recall caveat, by construction: a query whose kCand
    * nearest are ALL same-label yields fewer than k negatives — size
    * kCand to the expected same-label crowd (default 4·k). Ranks on
    * the served 6dp-rounded cosine (ties broken by neighbor id).
    */
  def hardNegativesIvf(spark: org.apache.spark.sql.SparkSession,
                       indexRoot: String, queries: DataFrame,
                       idCol: String, vecCol: String, labelCol: String,
                       labels: DataFrame, nProbe: Int, k: Int,
                       kCand: Int = 0): DataFrame = {
    val kc = if (kCand > 0) kCand else 4 * k
    require(kc >= k, s"kCand $kc must be >= k $k")
    val served = ivfServe(spark, indexRoot, queries, idCol, vecCol,
      nProbe, kc, excludeSelf = true)
    val qLab = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("query_label"))
    val nLab = labels.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("neighbor_label"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    nLab.join(broadcast(served.join(qLab, Seq("query_id"))),
        Seq("neighbor_id"))
      .filter(col("neighbor_label") =!= col("query_label"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"), col("cosine"), col("rank"))
  }

  private def sq8GridTable(indexRoot: String) = s"$indexRoot/sq8_grid"
  private def sq8AssignmentTable(indexRoot: String) = s"$indexRoot/assignment_sq8"

  /** SQ8-compressed persisted IVF index (the FAISS IVFx,SQ8 shape):
    * the inverted file stores one BYTE per dimension instead of a
    * float32 — 4× less index storage and probe-scan I/O, the lever
    * that matters when the inverted file IS the corpus. Queries stay
    * float; ranking uses the fused asymmetric dot (query · dequantized
    * code, no float array materialized per pair). Three tables under
    * `indexRoot`: `centroids`, `sq8_grid` (per-dimension min/scale),
    * `assignment_sq8` (id, code, cell, nrm). Recall loss vs
    * [[ivfBuildIndex]] is bounded by the grid step, same as
    * [[bruteTopKSq8]] vs [[bruteTopK]].
    */
  def ivfBuildIndexSq8(corpus: DataFrame, idCol: String, vecCol: String,
                       nCentroids: Int, indexRoot: String,
                       trainSample: Int = 100000): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import graft.functions.VectorExpressions
    import graft.offline.VersionedStore
    val spark = corpus.sparkSession
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("fv", array_to_vector(col("v")))
    quantizerTrainings.incrementAndGet()
    val trained = new KMeans().setK(nCentroids).setSeed(42L)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(base.orderBy("id").limit(trainSample))
    val p = sq8Train(corpus, vecCol)
    // norms from the DEQUANTIZED codes, not the float originals —
    // ranking must be self-consistent with what serving can compute
    val assigned = trained.transform(base).drop("fv")
      .select(col("id"),
        VectorExpressions.sq8Encode(col("v"), p.mins, p.scales).as("code"),
        col("cell"))
      .withColumn("nrm",
        VectorExpressions.sq8Norm(col("code"), p.mins, p.scales))
    val centroids = trained.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }
    VersionedStore.overwrite(
      spark.createDataFrame(centroids.toSeq).toDF("c_cell", "cv"),
      centroidTable(indexRoot))
    VersionedStore.overwrite(
      spark.createDataFrame(
        (0 until p.dim).map(i => (i, p.mins(i), p.scales(i))))
        .toDF("pos", "mn", "scale"),
      sq8GridTable(indexRoot))
    VersionedStore.overwrite(
      assigned.repartitionByRange(nCentroids, col("cell"))
        .sortWithinPartitions("cell"),
      sq8AssignmentTable(indexRoot))
  }

  /** Serve from an SQ8-compressed persisted index: probe like
    * [[ivfServe]] (including the file-level probed-cell pruning), rank
    * with the asymmetric quantized dot. Result contract matches
    * [[bruteTopKSq8]] when every cell is probed — note bruteTopKSq8
    * itself ALWAYS excludes self, so full-probe parity checks must
    * pass `excludeSelf = true` explicitly.
    *
    * `excludeSelf` defaults to FALSE, same as [[ivfServe]]: serving
    * queries usually come from an id space unrelated to the corpus,
    * where an accidental query_id == corpus id collision must not
    * silently drop a true neighbor.
    */
  def ivfServeSq8(spark: org.apache.spark.sql.SparkSession,
                  indexRoot: String, queries: DataFrame, idCol: String,
                  vecCol: String, nProbe: Int, k: Int,
                  excludeSelf: Boolean = false): DataFrame = {
    import graft.functions.VectorExpressions
    import graft.offline.VersionedStore
    val gridRows = VersionedStore.read(spark, sq8GridTable(indexRoot))
      .collect().sortBy(_.getInt(0))
    val p = Sq8Params(gridRows.map(_.getDouble(1)),
      gridRows.map(_.getDouble(2)))
    val centroidDf = VersionedStore.read(spark, centroidTable(indexRoot))
      .withColumn("cnrm", Fns.l2Norm(col("cv")))
    val qBase = queries.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Fns.l2Norm(col("v")))
    val (cells, probes) = probedCellsAndProbes(qBase, centroidDf, nProbe)
    val assigned = VersionedStore.readValues(spark,
      sq8AssignmentTable(indexRoot), "cell", cells)
    rankStage(probes,
      assigned.select(col("id").as("neighbor_id"), col("code"),
        col("nrm").as("cn"), col("cell")),
      VectorExpressions.sq8Dot(col("qv"), col("code"), p.mins, p.scales) /
        (col("qn") * col("cn")),
      k, excludeSelf)
  }

  private def pqCodebookTable(indexRoot: String) = s"$indexRoot/pq_codebook"
  private def pqAssignmentTable(indexRoot: String) = s"$indexRoot/assignment_pq"

  /** PQ-compressed persisted IVF index (the FAISS IVFx,PQm shape):
    * the inverted file stores m BYTES per vector — dim·4/m× less
    * index storage and probe-scan I/O than float32 (32× at dim 64,
    * m 8), one compression tier below [[ivfBuildIndexSq8]]. Tables
    * under `indexRoot`: `centroids`, `pq_codebook` (subspace,
    * centroid, vals — the driver-bounded Lloyd artifact), and
    * `assignment_pq` (id, code, cell, nrm) — norms from the PQ
    * RECONSTRUCTION, so ranking is self-consistent with what serving
    * can compute (the SQ8 convention).
    */
  def ivfBuildIndexPq(corpus: DataFrame, idCol: String, vecCol: String,
                      nCentroids: Int, dim: Int, m: Int, k: Int,
                      indexRoot: String,
                      trainSample: Int = 100000): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import graft.functions.VectorExpressions
    import graft.offline.VersionedStore
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("fv", array_to_vector(col("v")))
    quantizerTrainings.incrementAndGet()
    val trained = new KMeans().setK(nCentroids).setSeed(42L)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(base.orderBy("id").limit(trainSample))
    val p = pqTrain(corpus, idCol, vecCol, dim, m, k, trainSample)
    val assigned = trained.transform(base).drop("fv")
      .select(col("id"),
        VectorExpressions.pqEncode(col("v"), p.codebook, p.m, p.k,
          p.dsub).as("code"),
        col("cell"))
      .withColumn("nrm",
        VectorExpressions.pqNorm(col("code"), p.codebook, p.m, p.k,
          p.dsub))
    val centroids = trained.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }
    VersionedStore.overwrite(
      spark.createDataFrame(centroids.toSeq).toDF("c_cell", "cv"),
      centroidTable(indexRoot))
    val cbRows = for (j <- 0 until p.m; c <- 0 until p.k) yield
      (j, c, java.util.Arrays.copyOfRange(p.codebook,
        (j * p.k + c) * p.dsub, (j * p.k + c + 1) * p.dsub).toSeq)
    VersionedStore.overwrite(
      cbRows.toDF("subspace", "centroid", "vals"),
      pqCodebookTable(indexRoot))
    VersionedStore.overwrite(
      assigned.repartitionByRange(nCentroids, col("cell"))
        .sortWithinPartitions("cell"),
      pqAssignmentTable(indexRoot))
  }

  /** The stored PQ codebook, reassembled. */
  def pqParamsFromIndex(spark: org.apache.spark.sql.SparkSession,
                        indexRoot: String): PqParams = {
    import graft.offline.VersionedStore
    val rows = VersionedStore.read(spark, pqCodebookTable(indexRoot))
      .collect().map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    val m = rows.iterator.map(_._1).max + 1
    val k = rows.iterator.map(_._2).max + 1
    val dsub = rows.head._3.length
    val cb = new Array[Float](m * k * dsub)
    rows.foreach { case (j, c, vals) =>
      System.arraycopy(vals, 0, cb, (j * k + c) * dsub, dsub)
    }
    PqParams(m, k, dsub, cb)
  }

  /** Serve from a PQ-compressed persisted index: probe like
    * [[ivfServe]] (including the file-level probed-cell pruning),
    * rank with the fused asymmetric (ADC) dot. Full-probe parity
    * with [[bruteTopKPq]] under the same codebook holds exactly
    * (bruteTopKPq always excludes self — pass excludeSelf = true).
    */
  def ivfServePq(spark: org.apache.spark.sql.SparkSession,
                 indexRoot: String, queries: DataFrame, idCol: String,
                 vecCol: String, nProbe: Int, k: Int,
                 excludeSelf: Boolean = false): DataFrame = {
    import graft.functions.VectorExpressions
    import graft.offline.VersionedStore
    val p = pqParamsFromIndex(spark, indexRoot)
    val centroidDf = VersionedStore.read(spark, centroidTable(indexRoot))
      .withColumn("cnrm", Fns.l2Norm(col("cv")))
    val qBase = queries.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Fns.l2Norm(col("v")))
    val (cells, probes) = probedCellsAndProbes(qBase, centroidDf, nProbe)
    val assigned = VersionedStore.readValues(spark,
      pqAssignmentTable(indexRoot), "cell", cells)
    rankStage(probes,
      assigned.select(col("id").as("neighbor_id"), col("code"),
        col("nrm").as("cn"), col("cell")),
      VectorExpressions.pqAdcDot(col("qv"), col("code"), p.codebook,
        p.m, p.k, p.dsub) / (col("qn") * col("cn")),
      k, excludeSelf)
  }

  /** Nearest existing centroid per update row: (id, v, cell) via the
    * same L2-argmin (argmax of dot − |c|²/2, ties to the lowest cell)
    * the probe stage uses. */
  private[operators] def assignToCentroids(updates: DataFrame, idCol: String,
                                vecCol: String, centroidDf: DataFrame)
  : DataFrame = {
    import graft.functions.VectorExpressions.dotF
    val w = Window.partitionBy("id").orderBy(
      (dotF(col("v"), col("cv")) - col("cnrm") * col("cnrm") / 2).desc,
      col("c_cell"))
    updates.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(centroidDf))
      .withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .select(col("id"), col("v"), col("c_cell").as("cell"))
  }

  /** Refresh a persisted index with new or changed vectors: assign
    * each update to its nearest EXISTING centroid (same L2-argmin the
    * probe stage uses; no retraining) and MERGE into the assignment
    * table by id — a partial copy-on-write commit, not a rebuild.
    * Centroids drift from optimal as the corpus grows; rebuild with
    * [[ivfBuildIndex]] when recall degrades.
    */
  def ivfIndexUpsert(updates: DataFrame, indexRoot: String,
                     idCol: String, vecCol: String): Long = {
    import graft.offline.VersionedStore
    val spark = updates.sparkSession
    val centroidDf = VersionedStore.read(spark, centroidTable(indexRoot))
      .withColumn("cnrm", Fns.l2Norm(col("cv")))
    val assignedNew = assignToCentroids(updates, idCol, vecCol, centroidDf)
      .withColumn("nrm", Fns.l2Norm(col("v")))
    VersionedStore.merge(assignedNew, assignmentTable(indexRoot), Seq("id"))
  }

  /** Health report for a persisted float IVF index: one row per cell
    * with its vector count and cosine-to-centroid stats — the rebuild
    * signal behind the documented centroid-drift caveat on
    * [[ivfIndexUpsert]] and Dedup.embeddingSemdedupIncremental.
    * Upserts assign to FROZEN centroids, so as the corpus drifts,
    * cells bloat unevenly and their members sit further from the
    * centroid; watch `n` skew and falling `avg_cos` / `min_cos`, and
    * rebuild with [[ivfBuildIndex]] when they degrade. One broadcast
    * join + one aggregate over the inverted file — run it as cheaply
    * as any count.
    */
  def ivfIndexStats(spark: org.apache.spark.sql.SparkSession,
                    indexRoot: String): DataFrame = {
    import graft.functions.VectorExpressions.dotF
    import graft.offline.VersionedStore
    val centroids = VersionedStore.read(spark, centroidTable(indexRoot))
      .withColumn("cnrm", Fns.l2Norm(col("cv")))
    VersionedStore.read(spark, assignmentTable(indexRoot))
      .join(broadcast(centroids), col("cell") === col("c_cell"))
      .withColumn("cos_c", round(
        dotF(col("v"), col("cv")) / (col("nrm") * col("cnrm")), 6))
      .groupBy("cell").agg(
        count(lit(1)).as("n"),
        round(avg(col("cos_c")), 6).as("avg_cos"),
        min(col("cos_c")).as("min_cos"))
      .orderBy("cell")
  }

  /** Remove vectors from a persisted IVF index by id — the
    * vector-side right-to-be-forgotten (retract PII/copyrighted
    * embeddings without a rebuild): a copy-on-write DELETE on the
    * inverted file; centroids stay frozen (removals shrink cells, so
    * no drift — watch [[ivfIndexStats]] for the opposite problem on
    * upserts). On the cell-sorted layout the id ranges per file are
    * wide, so a scattered delete may rewrite most of the inverted
    * file — batch deletions, then [[ivfIndexCompact]], exactly like
    * replacement-heavy text-index workloads. Handles the float and
    * the SQ8 inverted file (whichever exist under the root). */
  def ivfIndexDelete(ids: DataFrame, indexRoot: String,
                     idCol: String): Unit = {
    import graft.offline.VersionedStore
    val spark = ids.sparkSession
    val keys = ids.select(col(idCol).as("id"))
    if (VersionedStore.latestVersion(spark, assignmentTable(indexRoot)) >= 0L)
      VersionedStore.deleteKeys(keys, assignmentTable(indexRoot), Seq("id"))
    if (VersionedStore.latestVersion(spark,
        sq8AssignmentTable(indexRoot)) >= 0L)
      VersionedStore.deleteKeys(keys, sq8AssignmentTable(indexRoot),
        Seq("id"))
    if (VersionedStore.latestVersion(spark,
        pqAssignmentTable(indexRoot)) >= 0L)
      VersionedStore.deleteKeys(keys, pqAssignmentTable(indexRoot),
        Seq("id"))
  }

  /** Refresh an SQ8-compressed persisted index: encode updates with
    * the index's STORED quantization grid (codes must stay comparable
    * to the existing inverted file — re-deriving the grid from the
    * updates would silently shift every dot product), assign to
    * existing centroids, MERGE by id.
    */
  def ivfIndexUpsertSq8(updates: DataFrame, indexRoot: String,
                        idCol: String, vecCol: String): Long = {
    import graft.functions.VectorExpressions
    import graft.offline.VersionedStore
    val spark = updates.sparkSession
    val gridRows = VersionedStore.read(spark, sq8GridTable(indexRoot))
      .collect().sortBy(_.getInt(0))
    val p = Sq8Params(gridRows.map(_.getDouble(1)),
      gridRows.map(_.getDouble(2)))
    val centroidDf = VersionedStore.read(spark, centroidTable(indexRoot))
      .withColumn("cnrm", Fns.l2Norm(col("cv")))
    val assignedNew = assignToCentroids(updates, idCol, vecCol, centroidDf)
      .select(col("id"),
        VectorExpressions.sq8Encode(col("v"), p.mins, p.scales).as("code"),
        col("cell"))
      .withColumn("nrm",
        VectorExpressions.sq8Norm(col("code"), p.mins, p.scales))
    VersionedStore.merge(assignedNew, sq8AssignmentTable(indexRoot),
      Seq("id"))
  }

  /** LSH-bucketed ANN: same-bucket pairs ranked by cosine within each
    * query. Recall is tunable via nPlanes (fewer planes → bigger
    * buckets → higher recall, more compute).
    */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              nPlanes: Int, dim: Int, k: Int): DataFrame = {
    import graft.functions.VectorExpressions.dotF
    val bucketed = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), nPlanes, dim).as("bucket"),
      Fns.l2Norm(col(vecCol)).as("nrm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("neighbor_id"),
        col("a.bucket").as("bucket"),
        (dotF(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
          .as("cos_raw"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("bucket"),
        round(col("cos_raw"), 6).as("cosine"), col("rank"))
  }
}
