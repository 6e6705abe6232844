package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** SOFT dedup (SoftDeDup, He et al. 2024: DOWNWEIGHT duplicated
    * content in the training loss instead of dropping it — removal
    * discards the unique tail of mostly-duplicated documents, while
    * a 1/multiplicity weight keeps every document visible at the
    * same effective token budget): per doc, the exact-content copy
    * count and the integer basis-point loss weight
    * `10000 DIV n_copies` (truncating — the engine's basis-point
    * rate convention, and DuckDB `//` parity). NULL-text docs form
    * their OWN copy group (the hash coalesces to a non-hex sentinel
    * — an inner join on a null hash would silently drop them,
    * breaking the every-doc-weighted contract). One content-hash
    * aggregate + one join back over a single checkpointed hash
    * projection (the text is scanned and hashed ONCE, not per
    * consumer); compose with [[clusters]] to weight by NEAR-dup
    * multiplicity instead (the cluster id replaces the content hash
    * — same shape). */
  def softDedupWeights(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val hashed = docs.select(col(idCol).as("doc_id"),
        coalesce(md5(col(textCol)), lit("null")).as("content_hash"))
      .localCheckpoint(false) // one scan+hash for counts AND join
    val copies = hashed.groupBy("content_hash")
      .agg(count(lit(1)).as("n_copies"))
    hashed.join(copies, "content_hash")
      .select(col("doc_id"), col("n_copies"),
        expr("10000 DIV n_copies").as("weight_bp"))
  }

  /** Canonical URL key: the dedup identity web-crawl pipelines use
    * BEFORE any content hashing (the same page is re-fetched under
    * scheme/case/tracking-parameter/trailing-slash variants — URL
    * dedup collapses those for free, no text comparison). Rules, in
    * order: scheme stripped; fragment stripped; host lowercased,
    * leading `www.` and default `:80`/`:443` ports removed; trailing
    * slashes trimmed from the path; tracking parameters
    * (`utm_*`, `fbclid`, `gclid`, `ref`) dropped and the surviving
    * query parameters SORTED so parameter order cannot split a
    * group. Pure string/array functions — one projection, and every
    * rule is portably expressible, so the dedup is oracle-checkable
    * end to end.
    */
  def urlCanonical(url: Column): Column = {
    val noScheme = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val noFrag = regexp_replace(noScheme, "#.*$", "")
    val parts = split(noFrag, "\\?", 2)
    val hp = element_at(parts, 1)
    val q = when(size(parts) > 1, element_at(parts, 2)).otherwise(lit(""))
    val host0 = substring_index(hp, "/", 1)
    val pathCol = hp.substr(length(host0) + lit(1), length(hp))
    val host = regexp_replace(
      regexp_replace(lower(host0), "^www\\.", ""), ":(443|80)$", "")
    val pathClean = regexp_replace(pathCol, "/+$", "")
    val qTerms = filter(split(q, "&"), x =>
      x =!= "" && !x.rlike("^(utm_[^=]*|fbclid|gclid|ref)="))
    val qClean = array_join(array_sort(qTerms), "&")
    concat(host, pathClean,
      when(qClean =!= "", concat(lit("?"), qClean)).otherwise(lit("")))
  }

  /** URL-level dedup groups: one row per canonical URL with the
    * keep-min id and variant count — the [[exact]] contract keyed by
    * [[urlCanonical]] instead of the content hash. Single shuffle on
    * the canonical key. */
  def dedupByUrl(docs: DataFrame, idCol: String, urlCol: String)
  : DataFrame =
    docs.groupBy(urlCanonical(col(urlCol)).as("canonical_url"))
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
    // repartition(s): the shingle explode feeds FOUR consumers (both
    // self-join sides, the df cap, per-doc sizes); without an exchange
    // boundary each recomputes the projection from the scan. One
    // explicit hash exchange on the join key makes every consumer a
    // ReusedExchange reader — projection runs once, and the self-join
    // arrives pre-partitioned (same-session A/B at sf0.1: 2.2s → 1.65s
    // capped; winnowPairs 5.4s → 3.0s).
    val sh = shingleIndex(docs, idCol, textCol, n).repartition(col("s"))
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

  /** Near-dup candidate pairs from WINNOWING fingerprints
    * ([[TextAnalysis.winnow]]): docs sharing >= `minShared` window-
    * minimum fingerprints. The winnowing guarantee makes this a
    * principled detector, not a heuristic: any shared run of
    * >= k+w-1 words forces a shared fingerprint, so contiguous-copy
    * pairs cannot be missed — while the ~1/w fingerprint density
    * makes the inverted-index join w× lighter per side (w² per pair)
    * than full-shingle ngramJaccard. `maxDf` caps hyper-frequent
    * fingerprints (boilerplate minima) exactly like ngramJaccard's
    * cap, bounding per-key join fan-out; every stage is an equi-join
    * or map-side-combinable aggregate.
    */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 5, w: Int = 4, minShared: Long = 2L,
                  maxDf: Long = 100L): DataFrame =
    invertedIndexPairs(TextAnalysis.winnow(docs, idCol, textCol, k, w),
      Seq("fp"), minShared, maxDf, "shared_fps")

  /** The ONE df-capped inverted-index pair body every
    * shared-fingerprint detector feeds ([[winnowPairs]] on text
    * minima, [[MultiModal.videoNearDupPairs]] on frame hashes):
    * `fps` = (doc_id, keyCols…); candidates come from the key
    * equi-join, never an all-pairs scan; keys shared by more than
    * `maxDf` docs are dropped from candidate generation (bounding
    * hot-key fan-out from boilerplate); a pair survives with the
    * shared-key count ≥ `minShared`.
    *
    * The leading repartition on the key is deliberate: the upstream
    * fingerprint projection feeds three consumers (both self-join
    * sides + the df cap), and one explicit exchange lets them share
    * a single computation via ReusedExchange instead of recomputing
    * per consumer (same-session A/B at sf0.1: 5.4s → 3.0s, identical
    * pairs) — it is also the one shuffle the inverted-index join
    * needs anyway. `dedupPerDoc` collapses duplicate (doc, key) rows
    * AFTER that exchange (hash partitioning on the key already
    * clusters the dedup keys, so no second shuffle) for callers
    * whose shared-count semantics are over DISTINCT keys per doc. */
  private[graft] def invertedIndexPairs(fps: DataFrame,
                                        keyCols: Seq[String],
                                        minShared: Long, maxDf: Long,
                                        sharedCol: String,
                                        dedupPerDoc: Boolean = false)
  : DataFrame = {
    val parted = fps.repartition(keyCols.map(col): _*)
    val base =
      if (dedupPerDoc) parted.dropDuplicates("doc_id" +: keyCols)
      else parted
    val joinSide =
      if (maxDf <= 0) base
      else {
        val rare = base.groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf)
          .select(keyCols.map(col): _*)
        base.join(rare, keyCols)
      }
    joinSide.as("a")
      .join(joinSide.as("b"),
        keyCols.map(kc => col(s"a.$kc") === col(s"b.$kc"))
          .reduce(_ && _) && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as(sharedCol))
      .filter(col(sharedCol) >= minShared)
  }

  /** MinHash signature + LSH banding candidate pairs.
    * k hash functions realized as xxhash64 with distinct seeds folded
    * per doc (one shuffle); signatures cut into `bands` bands of
    * k/bands rows; docs sharing any band key become candidates.
    * Entirely stateless — no fitted model, survives any data size.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 n: Int, k: Int, bands: Int): DataFrame =
    minhashLshFromIndex(shingleIndex(docs, idCol, textCol, n), k, bands)

  /** Same, over a pre-built (doc_id, s) shingle index — lets pipeline
    * callers share one ShingleHash pass between candidate generation
    * and exact verification. */
  def minhashLshFromIndex(sh: DataFrame, k: Int, bands: Int): DataFrame = {
    val banded = bandKeys(sh, k, bands)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** MinHash LSH band keys per doc: (doc_id, band, key). The shared
    * signature machinery behind [[minhashLshFromIndex]] and the
    * incremental-dedup state (band keys persist; new shards equi-join
    * them). */
  private[operators] def bandKeys(sh: DataFrame, k: Int,
                                  bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    val minAggs = (0 until k).map(i =>
      min(xxhash64(lit(i), col("s"))).as(s"mh_$i"))
    val sigs = sh.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
    val bandKey = (b: Int) =>
      xxhash64(lit(b) +: (0 until rows).map(r => col(s"mh_${b * rows + r}")): _*)
    sigs.select(col("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandKey(b).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Portable-md5 MinHash signatures: (doc_id, sig) where sig is the
    * k-long min-hash array of [[graft.functions.MinHashMd5]] — ONE
    * codegen projection per doc (no explode, no shuffle; the k mins
    * fold inside the row loop). Docs with fewer than n words carry no
    * signature and are dropped, mirroring the SQL side's empty
    * shingle set. */
  def minhashMd5Signatures(docs: DataFrame, idCol: String,
                           textCol: String, n: Int, k: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        graft.functions.ShingleHash.minhashMd5(col(textCol), n, k)
          .as("sig"))
      .filter(size(col("sig")) === k)

  /** md5 LSH band keys per doc: (doc_id, band, key), key =
    * md5Hash31(concat_ws(',', 'band'||b, sig slice)) — the exact
    * string the oracle rebuilds from its mh_i columns. */
  private[operators] def minhashMd5BandKeys(sigs: DataFrame, k: Int,
                                            bands: Int): DataFrame = {
    require(bands >= 1 && k % bands == 0, "k must divide into bands")
    val rows = k / bands
    sigs.select(col("doc_id"),
        explode(array((0 until bands).map { b =>
          val parts = lit(s"band$b") +: (0 until rows).map(r =>
            element_at(col("sig"), b * rows + r + 1))
          struct(lit(b).as("band"),
            Fns.md5Hash31(concat_ws(",", parts: _*)).as("key"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.key").as("key"))
  }

  /** MinHash+LSH near-dup pairs, ORACLE-REPLAYABLE end-to-end — the
    * portable-md5 family of the engine's two-family dedup-hash
    * contract (the bloom/CM precedent in [[Sketch]]): signatures,
    * band keys, candidate pairs AND the exact-Jaccard verify all
    * derive from md5 over shingle STRINGS, so the whole pipeline —
    * the most-used near-dup recipe in LLM curation — replays in
    * DuckDB SQL. [[minhashLsh]] (xxhash64) remains the production
    * family: same algorithm, faster hashes, spec-held to the same
    * recall contract (every exact-duplicate pair collides on ALL
    * bands in both families — J=1 recall is 1.0 by construction; at
    * J ≥ t recall is the usual 1-(1-t^r)^b curve per family's
    * independent draws).
    *
    * Output: verified pairs (doc_a, doc_b, n_bands, jaccard) with
    * exact shingle-set jaccard ≥ `threshold` — precision 1.0.
    *
    * SCALE SHAPE: signatures are one codegen projection (no explode
    * — the k mins fold per row); candidates an equi-join on
    * (band, key) + a map-side-combinable count; the verify shingle
    * index is built ONLY for candidate docs (left_semi first), and
    * one explicit repartition(doc_id) makes the sizes aggregate and
    * both verify join sides ReusedExchange readers of a single
    * exchange. Degenerate corpora (thousands of byte-identical docs)
    * make a band key a hot SELF-join key, which AQE cannot split —
    * route such corpora through exact-hash dedup first
    * ([[Dedup.pipeline]]'s stage order), which removes identical
    * copies before any LSH join.
    */
  def minhashMd5Pairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, k: Int = 16, bands: Int = 4,
                      threshold: Double = 0.8): DataFrame = {
    // repartition(band, key): the signature+banding projection feeds
    // BOTH self-join sides — one explicit exchange on the join key
    // makes the second side a ReusedExchange reader (the ngramJaccard
    // / winnowPairs precedent), so the k-min md5 signatures compute
    // ONCE, and the self-join arrives pre-partitioned.
    val banded = minhashMd5BandKeys(
        minhashMd5Signatures(docs, idCol, textCol, n, k), k, bands)
      .repartition(col("band"), col("key"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
      // pair-bounded; three consumers (both candIds legs + the verify
      // join) — materialize once instead of recomputing the whole
      // candidate subtree per consumer
      .localCheckpoint(false)
    val candIds = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val sh = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        explode(graft.functions.ShingleHash.shingleStrings(
          col("text"), n)).as("s"))
      .repartition(col("doc_id"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("s")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("s")),
        Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b", "n_bands")
      .agg(count(lit(1)).as("common"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")),
        "doc_b")
      .withColumn("jaccard",
        round(col("common") / (col("sz_a") + col("sz_b") - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_bands", "jaccard")
  }

  /** GRAM-PROJECTION document vectors: (doc_id, gv) — the
    * feature-hashing signed-projection near-dup embedding
    * ([[graft.functions.GramProject]]), ONE codegen pass per doc.
    * Integer components (exact in any engine); cast `gv` to
    * array<float> to feed the ANN serving tier (components are small
    * integers — float-exact) — the RETSim-style
    * near-dup-embedding-into-ANN recipe with a model-free,
    * oracle-replayable projection. Docs with fewer than n words
    * carry no vector and drop. */
  def gramProjectVectors(docs: DataFrame, idCol: String,
                         textCol: String, n: Int = 3,
                         dim: Int = 16): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        graft.functions.ShingleHash.gramProject(col(textCol), n, dim)
          .as("gv"))
      .filter(size(col("gv")) === dim)

  /** Near-dup pairs over the gram-projection vectors: exact integer
    * dot products (dim-term codegen expression — no float folding,
    * no accumulation order), cosine = dot / (√n2_a·√n2_b) rounded
    * 6dp, threshold filter. The pair scan runs through the
    * triangular [[blockedSelfPairs]] (self-join hot keys are
    * un-splittable by AQE); zero-vectors (every sign cancelled — no
    * direction) are declared dropped. Precision exact by
    * construction; this is the moderate-threshold oracle twin — at
    * scale feed [[gramProjectVectors]] (cast float) into
    * [[embeddingCosineLsh]] or the ANN tier for candidate
    * generation. */
  def gramProjectPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, dim: Int = 16,
                       threshold: Double = 0.9,
                       nBlocks: Int = 16): DataFrame = {
    // dots run through the ONE fused dotF loop on the float-exact
    // cast (components are bounded by the doc's shingle count, and a
    // 16-term sum of their products stays far under 2^53 — every dot
    // is integer-valued and EXACT in the double fold, so the integer
    // SQL oracle replays bit-for-bit). The A/B that picked this
    // shape: a 2·dim-node element_at chain cost ~3.8 µs/pair at
    // sf0.1 (48.6 s); the fused loop + a localCheckpoint that
    // computes the md5 projection once cut it to the
    // q_dedup_embedding regime.
    val base = gramProjectVectors(docs, idCol, textCol, n, dim)
      .select(col("doc_id").as("id"),
        col("gv").cast("array<float>").as("v"))
      .withColumn("n2", graft.functions.VectorExpressions
        .dotF(col("v"), col("v")))
      .filter(col("n2") > 0) // zero vector: no direction, no cosine
      .withColumn("nrm", sqrt(col("n2")))
      .localCheckpoint(false) // vectors once, not per join side
    roundedCosineAtLeast(blockedSelfPairs(base, Seq(), nBlocks),
        graft.functions.VectorExpressions
          .dotF(col("va"), col("vb")) / (col("nrm_a") * col("nrm_b")),
        threshold)
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"), col("cosine"))
  }

  /** Per-doc 64-bit SimHash signatures via the single-pass codegen'd
    * SimHash64 expression — no explode, no shuffle, one loop per row.
    */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String)
  : DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.functions.SimHash64.simhash64(col(textCol)).as("sig"))

  /** SimHash near-dup pairs: 64-bit signature per doc, banded into
    * `maxHamming + 1` segments (pigeonhole: a pair differing in at
    * most `maxHamming` bits leaves at least one segment untouched, so
    * it always collides on that band key — recall 1.0 by construction
    * for the declared threshold), then an exact hamming filter for
    * precision. Candidate generation is a band-key equi-join, not an
    * all-pairs scan.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64), got $maxHamming")
    val nBands = maxHamming + 1
    // Segment widths: 64 bits split as evenly as possible — e.g.
    // maxHamming=6 → 7 bands of 10,9,9,9,9,9,9 bits.
    val widths = (0 until nBands).map(b =>
      64 / nBands + (if (b < 64 % nBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val withSig = simhashSignatures(docs, idCol, textCol)
    val banded = withSig.select(col("doc_id"), col("sig"),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), offsets(b))
            // width 64 (maxHamming=0): Scala shifts are mod 64, so
            // (1L<<64)-1 would be 0 — the full-signature band needs -1L
            .bitwiseAND(if (widths(b) == 64) -1L else (1L << widths(b)) - 1)
            .as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("sig"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        Fns.hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming) // before distinct: only
      .distinct()                           // survivors shuffle
  }

  /** Portable-md5 SimHash signatures: (doc_id, sig) where bit j of
    * the dim-bit signature is the SIGN of the n=1 gram projection's
    * component j (a positive sum of the per-distinct-word ±1 draws —
    * Charikar's construction with the engine's replayable 31-bit md5
    * hash as the bit source). One codegen pass per row; every doc has
    * a signature (a text always splits to ≥1 word). */
  def simhashMd5Signatures(docs: DataFrame, idCol: String,
                           textCol: String, dim: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        graft.functions.ShingleHash.gramProject(col(textCol), 1, dim)
          .as("gv"))
      .filter(size(col("gv")) === dim)
      .withColumn("sig", (0 until dim).map(j =>
        when(element_at(col("gv"), j + 1) > 0, lit(1L << j))
          .otherwise(lit(0L))).reduce(_ + _))
      .select("doc_id", "sig")

  /** SimHash near-dup pairs, ORACLE-REPLAYABLE end-to-end — the
    * portable-md5 family of [[simhashPairs]] (the q_minhash_md5
    * precedent applied to the second near-dup recipe): the dim-bit
    * signature, the pigeonhole banding (maxHamming+1 segments — a
    * pair within maxHamming bits ALWAYS collides on an untouched
    * band, recall 1.0 by construction for the declared radius), and
    * the exact popcount hamming filter all replay in integer SQL.
    * The 64-bit FNV [[simhashPairs]] stays the production family:
    * wider signatures → more selective band keys at corpus scale;
    * byte-identical texts collide at hamming 0 in BOTH families by
    * construction. Candidate generation is a band-key equi-join —
    * never an all-pairs scan. */
  def simhashMd5Pairs(docs: DataFrame, idCol: String, textCol: String,
                      dim: Int = 24, maxHamming: Int = 3): DataFrame = {
    require(dim >= 2 && dim <= 31, s"dim must be in [2, 31], got $dim")
    require(maxHamming >= 0 && maxHamming < dim,
      s"maxHamming must be in [0, $dim), got $maxHamming")
    val nBands = maxHamming + 1
    val widths = (0 until nBands).map(b =>
      dim / nBands + (if (b < dim % nBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    // repartition(band, key): the signature projection feeds both
    // self-join sides — one exchange shares it (the minhashMd5Pairs
    // reuse shape)
    val banded = simhashMd5Signatures(docs, idCol, textCol, dim)
      .select(col("doc_id"), col("sig"),
        explode(array((0 until nBands).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("sig"), offsets(b))
              .bitwiseAND((1L << widths(b)) - 1).as("key"))): _*))
          .as("bk"))
      .select(col("doc_id"), col("sig"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .repartition(col("band"), col("key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming) // before distinct: only
      .distinct()                           // survivors shuffle
  }

  /** Wide-SimHash near-dup pairs: `words` independent 64-bit
    * signatures concatenated into a 64·words-bit signature, banded
    * into maxHamming+1 segments. Same pigeonhole recall guarantee as
    * simhashPairs, but each band key carries ~64·words/(maxHamming+1)
    * bits instead of ~64/(maxHamming+1) — e.g. words=2, maxHamming=6
    * gives 10–22-bit keys instead of 9-bit, cutting random band
    * collisions by ~2 orders of magnitude. THE scale path when the
    * corpus is large enough that n²/2^9 candidate pairs hurt.
    *
    * Note the threshold semantic: hamming is measured over the WIDE
    * signature (sum of per-word hammings), so thresholds are on a
    * 64·words-bit scale — roughly `words`× the 64-bit distance for
    * the same document pair.
    */
  def simhashPairsWide(docs: DataFrame, idCol: String, textCol: String,
                       maxHamming: Int, words: Int = 2): DataFrame = {
    require(words >= 1 && maxHamming >= 0 && maxHamming < 64 * words,
      s"need 0 <= maxHamming < ${64 * words}")
    val nBands = maxHamming + 1
    val sigCols = (0 until words).map(wd =>
      graft.functions.SimHash64.simhash64(col(textCol), wd).as(s"sig$wd"))
    val withSig = docs.select(col(idCol).as("doc_id") +: sigCols: _*)
    // Greedy segment allocation: nBands disjoint segments covering all
    // 64·words bits, never crossing a 64-bit word boundary (so each
    // key extracts from exactly one signature column).
    var pos = 0
    var remaining = 64 * words
    val segs = (0 until nBands).map { b =>
      val target = remaining / (nBands - b)
      val word = pos / 64
      val off = pos % 64
      val width = math.min(target, 64 - off)
      pos += width; remaining -= width
      (word, off, width)
    }
    val banded = withSig.select(
      (col("doc_id") +: (0 until words).map(wd => col(s"sig$wd"))) :+
      explode(array(segs.zipWithIndex.map { case ((wd, off, width), b) =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col(s"sig$wd"), off)
            .bitwiseAND(if (width == 64) -1L else (1L << width) - 1)
            .as("key"))
      }: _*)).as("bk"): _*)
      .select(col("doc_id") +: (0 until words).map(wd => col(s"sig$wd")) :+
        col("bk.band").as("band") :+ col("bk.key").as("key"): _*)
    val wideHamming = (0 until words).map(wd =>
      Fns.hamming64(col(s"a.sig$wd"), col(s"b.sig$wd"))).reduce(_ + _)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        wideHamming.as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Connected components over a near-dup pair list (doc_a, doc_b):
    * every document labeled with the smallest doc id in its dup
    * cluster — the true canonical assignment (keepList's drop-right
    * rule under-merges transitive chains a~b~c).
    *
    * Iterative smallest-label propagation with pointer jumping: each
    * round every node adopts the minimum label among itself and its
    * neighbors, then jumps to its label's label (path halving), so a
    * component of diameter d converges in O(log d) rounds instead of
    * O(d) — a 1000-node chain closes in ~11 rounds. TWO propagate+jump
    * rounds are fused into every job: at the probe scale the dominant
    * cost was per-round job LAUNCH (~2s flat, not data), so halving
    * the job count halves the fixed overhead while the per-job work
    * (four equi-joins) stays far from any memory limit. The
    * convergence aggregate doubles as the cache materializer — still
    * ONE job per fused round. Superseded caches are unpersisted and
    * lineage is truncated with a lazy localCheckpoint every fused
    * round, so memory and plan depth stay bounded at any round count.
    */
  def clusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).cache()
    // One propagate+jump round over (id, old, label), preserving the
    // round-start `old` column for the convergence count. The
    // propagate step is union + ONE groupBy — min(self ∪ neighbor
    // labels) ≡ the former neighbor-groupBy + left join
    // (least(label, coalesce(min(neighbors), label))), with `old`
    // riding as max() since only the self row carries it — one fewer
    // shuffle op and ~25% fewer AQE stages per half-round. At this
    // loop's row counts the wall is STAGE SEQUENCING, not data: the
    // round-16 probe measured the warm loop at 54 jobs/3.6 s shipped
    // vs 42 jobs/2.8 s with this shape (diff 0 rows), ~66 ms per
    // scheduled stage either way.
    def halfRound(lbl: DataFrame): DataFrame = {
      val neighbor = edges
        .join(lbl.select(col("id").as("dst"), col("label").as("nlabel")),
          Seq("dst"))
        .select(col("src").as("id"),
          lit(null).cast(lbl.schema("old").dataType).as("old"),
          col("nlabel").as("label"))
      val propagated = lbl.select(col("id"), col("old"), col("label"))
        .unionByName(neighbor)
        .groupBy("id")
        .agg(max(col("old")).as("old"), min(col("label")).as("label"))
      // pointer jump: label <- label(label). Labels are always node
      // ids, so the self-join resolves every pointer one more hop.
      propagated.join(
          propagated.select(col("id").as("label"), col("label").as("plabel")),
          Seq("label"), "left_outer")
        .select(col("id"), col("old"),
          least(col("label"), coalesce(col("plabel"), col("label")))
            .as("label"))
    }
    // unpersist must target the EXACT cached frame: a projection of it
    // (labels.drop below) would not sameResult() the cached plan and
    // the uncache silently no-ops, pinning every round's cache.
    var cachedHandle = labels
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // The intermediate half-round MUST be cached: the outer round's
      // pointer-jump self-join references its input twice, and an
      // uncached intermediate would be recomputed down both branches —
      // multiplying the inner round's joins instead of halving job
      // count (measured 6× slower at the ×10 probe). The cache fills
      // lazily inside the same convergence job, so this adds no job.
      val once = halfRound(
        labels.select(col("id"), col("label").as("old"), col("label")))
        .cache()
      val fused = halfRound(once)
      // LAZY checkpoint EVERY round: materialized by the convergence
      // aggregate inside the SAME job (an eager checkpoint would be a
      // second full pass), and lineage truncation is mandatory, not
      // periodic — a fused round multiplies plan TEXT ~16× (each
      // self-join prints its subtree twice), and letting rounds
      // compound made AQE's per-stage plan rendering OOM the driver
      // building the explain string at the ×10 probe.
      val next = fused.localCheckpoint(false)
      // One job: materializes the cache AND counts changed labels.
      val changedRow = next
        .agg(sum(when(col("label") =!= col("old"), 1L).otherwise(0L))).head()
      val changed = if (changedRow.isNullAt(0)) 0L else changedRow.getLong(0)
      once.unpersist()
      cachedHandle.unpersist()
      cachedHandle = next
      labels = next.drop("old")
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"Dedup.clusters: label propagation did NOT converge within " +
        s"$maxIters fused rounds (${2 * maxIters} propagate+jump " +
        "iterations) — returned cluster ids may be non-canonical for " +
        s"components of diameter > 2^${2 * maxIters}")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** The dedup ACTION: which documents survive. A document is dropped
    * when it has any near-dup partner with a smaller doc_id (the
    * partner is the canonical copy) — the standard keep-min rule,
    * applied as a broadcast-able anti-join of the corpus against the
    * drop list. At 100 TB the drop list is orders of magnitude
    * smaller than the corpus, so the corpus never shuffles.
    *
    * By DEFAULT drops come from [[pipeline]] (exact-hash →
    * MinHash+LSH candidates → exact-Jaccard verify): every stage an
    * equi-join, no Σdf² inverted-index blowup — the path that holds
    * at corpus scale. `exact = true` instead derives drops from the
    * full exact [[ngramJaccard]] inverted index — the oracle
    * baseline, quadratic in per-shingle document frequency; `maxDf`
    * applies to that path only. The two agree whenever LSH candidate
    * recall is 1.0 (spec- and oracle-proven on the gate corpora).
    *
    * @note BEHAVIOR CHANGE (round 6): the default path switched from
    *   the exact inverted-index drop list to the MinHash+LSH pipeline.
    *   On corpora where LSH candidate recall < 1.0 the pipeline can
    *   keep a document the exact path would drop — callers that need
    *   the provably-exact decision (oracle baselines, audits) must now
    *   pass `exact = true` at the call site.
    */
  def keepList(docs: DataFrame, idCol: String, textCol: String,
               n: Int, threshold: Double, maxDf: Long = 0,
               exact: Boolean = false): DataFrame =
    if (!exact) {
      // the pipeline has no stop-shingle cap (LSH banding absorbs
      // boilerplate without df² joins) — silently dropping a
      // caller-supplied cap would be a behavior surprise, so refuse it
      require(maxDf == 0,
        "maxDf applies only to the exact inverted-index path — pass " +
          "exact = true, or drop maxDf for the pipeline path")
      pipeline(docs, idCol, textCol, n, threshold)
    } else {
      val dropIds = ngramJaccard(docs, idCol, textCol, n, threshold, maxDf)
        .select(col("doc_b").as(idCol)).distinct()
      docs.select(col(idCol).as("doc_id"))
        .join(broadcast(dropIds.withColumnRenamed(idCol, "doc_id")),
          Seq("doc_id"), "left_anti")
    }

  /** QUALITY-AWARE dedup survivor selection: within every TRANSITIVE
    * near-dup cluster keep the single best document by `score`
    * (ties broken by ascending doc id), instead of keepList's blind
    * keep-min-id rule — the selection real curation pipelines run,
    * where the canonical copy should be the longest / highest-quality
    * variant, not whichever crawled first. `pairs` is any near-dup
    * pair list (doc_a, doc_b) — [[ngramJaccard]] for the exact
    * baseline, [[minhashLsh]]/[[pipeline]] candidates at scale.
    * Returns the surviving doc ids (unclustered docs all survive).
    *
    * Scale shape: [[clusters]] resolves transitive membership in
    * O(log diameter) pointer-jump rounds; scoring is a projection;
    * the per-cluster argmax is a window over cluster ids (clusters
    * are small — bounded by dup-group size, not corpus); the drop
    * list anti-joins on the id — AQE broadcasts it when the dup
    * fraction is small, and a heavily-duplicated corpus (drop list ~
    * corpus order) degrades to an ordinary equi-join instead of an
    * oversized broadcast.
    */
  def keepBest(docs: DataFrame, idCol: String, pairs: DataFrame,
               score: Column): DataFrame =
    keepBestFromClusters(docs, idCol, clusters(pairs), score)

  /** The keep-best ACTION over a precomputed (doc_id, cluster_id)
    * membership table — the path a production pipeline runs: clusters
    * are the detection ARTIFACT (persist them in a VersionedStore;
    * [[clusters]] derives them from any pair list), and survivor
    * policy reruns against the artifact whenever the quality score
    * changes — without paying detection again. */
  def keepBestFromClusters(docs: DataFrame, idCol: String,
                           clusterIds: DataFrame,
                           score: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = docs.select(col(idCol).as("doc_id"), score.as("score"))
    val ranked = clusterIds.join(scored, Seq("doc_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("cluster_id")
          .orderBy(col("score").desc, col("doc_id"))))
    val dropIds = ranked.filter(col("rk") > 1).select("doc_id")
    // no broadcast hint: in a heavily-duplicated corpus the drop list
    // is (k-1)/k of the corpus — corpus order, not a minority side.
    // AQE broadcasts it when it is actually small.
    docs.select(col(idCol).as("doc_id"))
      .join(dropIds, Seq("doc_id"), "left_anti")
  }

  /** LEAKAGE-FREE train/test split: assign whole near-dup clusters to
    * one side, so a document and its near-duplicates can never
    * straddle the split — the guard against test-set contamination
    * that a plain per-document hash split ([[FeatureEng
    * .trainTestSplit]]) cannot give (a near-copy of a test doc in
    * train IS leakage). Unclustered docs are their own cluster. The
    * side is the md5 bucket of the CLUSTER id — same deterministic
    * hash family as trainTestSplit, so the assignment is reproducible
    * on any cluster, and membership is a pure function of
    * (cluster id, trainPct). Returns (doc_id, cluster_id, split).
    *
    * Scale shape: [[clusters]] as in [[keepBest]]; the membership
    * table (clustered docs only) joins on the id — AQE broadcasts it
    * when the dup fraction is small, and a heavily-duplicated corpus
    * degrades to an ordinary equi-join instead of an oversized
    * broadcast; the bucket is a pure projection.
    */
  def clusterSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                   trainPct: Int): DataFrame =
    clusterSplitFromClusters(docs, idCol, clusters(pairs), trainPct)

  /** Per-slice DEDUP IMPACT report — the data-card number released
    * corpora publish ("source X is 12% near-duplicate"): for each
    * `dims` tuple, how many docs the keep-min rule drops under the
    * given transitive cluster assignment (every cluster member that
    * is not its cluster's canonical). Returns
    * (dims..., n_docs, n_dropped, drop_rate).
    *
    * Scale shape: the drop list (clustered non-canonicals) joins on
    * the id — AQE broadcasts it when the dup fraction is small; the
    * per-slice counter aggregate is map-side combinable with
    * |dim tuples| result rows.
    */
  def dedupReportFromClusters(docs: DataFrame, idCol: String,
                              clusterIds: DataFrame,
                              dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "report needs at least one dimension")
    val drops = clusterIds.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"), lit(1L).as("is_drop"))
    // no broadcast hint (same reasoning as keepBestFromClusters):
    // the drop set is corpus-order under heavy duplication; AQE
    // broadcasts it when small
    docs.select(col(idCol).as("doc_id") +: dims.map(col): _*)
      .join(drops, Seq("doc_id"), "left_outer")
      .groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_drop"), lit(0L))).as("n_dropped"))
      .withColumn("drop_rate",
        round(col("n_dropped") / col("n_docs"), 6))
  }

  /** Dup-cluster SIZE distribution — the structural data-card number
    * ("mostly pairs, or a few megaclusters?") that decides dedup
    * strategy: pair-heavy corpora are cheap everywhere, megaclusters
    * are where df² detectors die and the pipeline order matters.
    * Input is a (doc_id, cluster_id) membership table; output one row
    * per observed size: (cluster_size, n_clusters). Two
    * map-side-combinable aggregates, |distinct sizes| result rows.
    */
  def clusterSizeProfile(clusterIds: DataFrame): DataFrame =
    clusterIds.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"))

  /** Persist the transitive-cluster membership table as a versioned
    * artifact: (doc_id, cluster_id) for every doc in `pairs`, the
    * table [[keepBestFromClusters]] / [[clusterSplitFromClusters]]
    * run policy against. Versioned (VersionedStore) so cluster
    * assignments are time-travelable — "which cluster was this doc in
    * when the v12 training set was cut" is a readTable(versionAsOf)
    * away. */
  def buildClusterIndex(pairs: DataFrame, root: String): Unit =
    graft.offline.VersionedStore.create(clusters(pairs), root)

  /** INCREMENTAL cluster-index refresh: fold a new shard's near-dup
    * pairs into the persisted index WITHOUT re-running detection or
    * clustering over history. The old assignment doubles as a
    * spanning STAR of each historical component (every member points
    * at its canonical), so running [[clusters]] over
    * star-edges ∪ new-pairs reproduces the batch components over ALL
    * pairs ever seen — including merges where a new doc bridges two
    * old clusters (both stars connect through the bridge, and the
    * min-id label is preserved because stars carry every old member).
    * Singleton docs (self-labeled) re-enter through the id spine.
    * Cost is |clustered history| + |new pairs| edges — clustered-
    * fraction-shaped, never corpus-shaped. Commits as an overwrite:
    * one version per refresh, history intact. Returns the new
    * assignment.
    */
  def refreshClusterIndex(spark: SparkSession, newPairs: DataFrame,
                          root: String): DataFrame = {
    import graft.offline.VersionedStore
    val state = VersionedStore.read(spark, root)
    val starEdges = state.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("doc_a"), col("cluster_id").as("doc_b"))
    val edges = starEdges.unionByName(newPairs.select("doc_a", "doc_b"))
    val merged = clusters(edges)
    val allIds = state.select("doc_id")
      .unionByName(newPairs.select(col("doc_a").as("doc_id")))
      .unionByName(newPairs.select(col("doc_b").as("doc_id")))
      .distinct()
    val assignment = allIds
      .join(merged, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .localCheckpoint(false)
    VersionedStore.overwrite(assignment, root)
    assignment
  }

  /** The split ACTION over a precomputed (doc_id, cluster_id)
    * membership table — same artifact contract as
    * [[keepBestFromClusters]]: resplit at any percentage without
    * re-detecting. */
  def clusterSplitFromClusters(docs: DataFrame, idCol: String,
                               clusterIds: DataFrame,
                               trainPct: Int): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100,
      s"trainPct must be in [0, 100], got $trainPct")
    // no broadcast hint: the membership table is EVERY clustered doc
    // (canonicals included), which a heavily-duplicated corpus can
    // push to corpus order — unlike the strictly-minority DROP lists
    // keepBest/keepList hint. AQE still broadcasts it when it is
    // actually small; when it isn't, this is a plain id equi-join.
    docs.select(col(idCol).as("doc_id"))
      .join(clusterIds, Seq("doc_id"), "left_outer")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      // THE split-routing rule, by reference: agreement with
      // trainTestSplit/TrainingExport is structural, not copy-paste
      .withColumn("split",
        FeatureEng.splitColumn("cluster_id", trainPct))
      .select("doc_id", "cluster_id", "split")
  }

  /** The production dedup pipeline in the order the scale probe proves
    * out (docs/SCALE_NOTES.md): exact dedup FIRST collapses identical
    * copies (removing the df² dup-cluster pressure), MinHash+LSH
    * generates candidate pairs on the survivors, and an exact n-gram
    * Jaccard computed ONLY over candidate pairs verifies them. Returns
    * the surviving doc ids (keep-min rule, same contract as keepList).
    *
    * Every stage is an equi-join: no all-pairs scan anywhere, and the
    * exact verification touches O(|candidates| · shingles/doc) rows
    * instead of the inverted index's O(Σ df²).
    */
  def pipeline(docs: DataFrame, idCol: String, textCol: String,
               n: Int, threshold: Double, k: Int = 32,
               bands: Int = 16): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // Docs shorter than n words (or with NULL text) produce no
    // shingles, so the exact path can never pair them — they bypass
    // EVERY stage (including the exact-hash dedup: dropping identical
    // short docs here would diverge from keepList's contract, which
    // keeps both). NULL text must be routed explicitly: size(NULL) is
    // NULL, which fails BOTH a filter and its negation.
    val isShort =
      col("text").isNull || size(Fns.words(col("text"))) < n
    val shortDocs = base.filter(isShort)
    val longDocs = base.filter(!isShort)
    // Stage 1: exact — keep the min doc id per content hash.
    val exactKeep = longDocs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    // Lazy localCheckpoints: survivors feeds the shingle index AND the
    // final anti-join; the index feeds candidates, sizes, and both
    // verify sides — materialized once at first action, reclaimed by
    // the ContextCleaner (unlike cache(), which pins until unpersist).
    val survivors = longDocs.join(exactKeep, Seq("doc_id"), "left_semi")
      .localCheckpoint(false)
    val sh = shingleIndex(survivors, "doc_id", "text", n)
      .localCheckpoint(false)
    // Stage 2: MinHash+LSH candidates over distinct content only.
    val cand = minhashLshFromIndex(sh, k, bands).select("doc_a", "doc_b")
    // Stage 3: exact Jaccard verify restricted to candidate pairs.
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val common = cand
      .join(sh.toDF("doc_a", "s"), "doc_a")
      .join(sh.toDF("doc_b", "s"), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
    val nearDrops = common
      .join(sizes.toDF("doc_a", "sz_a"), "doc_a")
      .join(sizes.toDF("doc_b", "sz_b"), "doc_b")
      .filter(round(col("common") /
        (col("sz_a") + col("sz_b") - col("common")), 6) >= threshold)
      .select(col("doc_b").as("doc_id")).distinct()
    survivors.select("doc_id")
      .join(broadcast(nearDrops), Seq("doc_id"), "left_anti")
      .unionByName(shortDocs.select("doc_id"))
  }

  // --- incremental dedup against persisted state ---------------------

  private def stateHashes(root: String) = s"$root/hashes"
  private def stateBands(root: String) = s"$root/bands"
  private def stateShingles(root: String) = s"$root/shingles"

  /** INCREMENTAL dedup: dedup a newly-arrived shard against persisted
    * state WITHOUT rescanning the corpus — the shape a continuously-
    * ingesting 100 TB pipeline actually needs (a daily shard must not
    * cost a full-corpus pipeline run). State under `stateRoot` is
    * three VersionedStore tables, appended per shard:
    *   - `hashes`   (h, doc_id): exact content hash per canonical doc
    *   - `bands`    (doc_id, band, key): MinHash LSH band keys
    *   - `shingles` (doc_id, s): distinct shingle hashes (the verify
    *     side — sizes derive from it)
    * The first call (no state yet) initializes from the shard.
    *
    * Semantics: first-seen wins — a new doc drops if it exact- or
    * near-dups anything already in state, or a smaller-id doc in its
    * own shard. State keeps EVERY exact-canonical new doc (including
    * near-dup-dropped ones), because the batch keep-min rule drops a
    * doc against ANY smaller-id partner, surviving or not. With
    * shards arriving in ascending doc_id order this reproduces the
    * batch [[pipeline]] over the union EXACTLY (spec-proven).
    *
    * Scale shape: every stage is an equi-join keyed on hash/band/
    * shingle; the new shard never joins old CORPUS rows, only the
    * state tables (hashes ~1 row/doc, bands ~`bands` rows/doc,
    * shingles ~tokens/doc — the inverted index, the honest price of
    * exact verification). Returns the surviving new doc ids.
    *
    * @param pruneStateDocs micro-shard fast path: when > 0 and the
    *   shard has at most this many canonical docs, each state join
    *   reads only the state FILES whose footer key ranges intersect
    *   the keys the shard itself brings (hashes by the shard's md5
    *   set, bands by its band-key hashes, shingles by the candidate
    *   old doc ids) instead of scanning state linearly. Results are
    *   identical — each prune is a superset of what its exact
    *   equi-join can consume — but state I/O becomes shard-shaped,
    *   not state-shaped, once [[compactDedupState]] has laid the
    *   tables out key-sorted. Costs one driver collect per state
    *   table, bounded by the gate (~1 + `bands` keys per doc), so
    *   keep it to genuinely small shards (streaming micro-batches,
    *   near-real-time ingestion) and leave 0 for bulk shards, where
    *   a linear state scan is the better plan anyway.
    * @param beforeRegister invoked with the final survivor frame
    *   AFTER the dedup is fully determined but BEFORE any state
    *   registration commits. This is the exactly-once hook for an
    *   at-least-once caller (foreachBatch): commit your output here,
    *   idempotently (e.g. MERGE by doc id). A replay that crashed
    *   before registration recomputes the identical survivors (every
    *   state read pins the pre-registration version, and the dedup is
    *   deterministic), so the re-commit merges the same rows; a
    *   replay that crashed after registration dedups to nothing and
    *   the re-commit is a no-op — either way the output lands exactly
    *   once. See streaming.StreamingNearDedup.
    */
  def dedupIncremental(newDocs: DataFrame, idCol: String, textCol: String,
                       stateRoot: String, n: Int, threshold: Double,
                       k: Int = 32, bands: Int = 16,
                       pruneStateDocs: Int = 0,
                       beforeRegister: DataFrame => Unit = _ => ()): DataFrame = {
    import graft.offline.VersionedStore
    val spark = newDocs.sparkSession
    val base = newDocs.select(col(idCol).as("doc_id"),
      col(textCol).as("text"))
    // same short-doc bypass as pipeline (no shingles → no pairing)
    val isShort = col("text").isNull || size(Fns.words(col("text"))) < n
    val shortDocs = base.filter(isShort)
    val longDocs = base.filter(!isShort)
    val exactKeep = longDocs
      .groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("doc_id"))
      .localCheckpoint(false)
    val haveState =
      VersionedStore.latestVersion(spark, stateHashes(stateRoot)) >= 0
    // Micro-shard pruning gate (see scaladoc). Key values ride
    // readValues' cast-to-double scale; the cast is monotone, so
    // footer pruning never drops a true match, and a 64-bit hash that
    // collides in double space merely survives the prune and falls
    // out of the exact long/string equi-join downstream.
    val pruned = pruneStateDocs > 0 && haveState &&
      exactKeep.count() <= pruneStateDocs
    // exact-vs-state: a new canonical whose hash is already known is
    // dropped and NOT re-registered (its cluster's canonical — bands,
    // shingles — is already in state, exactly as one batch exact
    // stage would have collapsed it)
    val activeH =
      if (!haveState) exactKeep
      else {
        val stateH =
          if (pruned)
            VersionedStore.readValuesStr(spark, stateHashes(stateRoot), "h",
              exactKeep.select("h").collect().map(_.getString(0)).toSeq)
          else VersionedStore.read(spark, stateHashes(stateRoot))
        exactKeep.join(stateH.select("h"), Seq("h"), "left_anti")
      }
    val active = longDocs
      .join(activeH.select("doc_id"), Seq("doc_id"), "left_semi")
      .localCheckpoint(false)
    val shNew = shingleIndex(active, "doc_id", "text", n)
      .localCheckpoint(false)
    val bandedNew = bandKeys(shNew, k, bands).localCheckpoint(false)
    // candidates among the shard (a < b) ...
    val candNew = bandedNew.as("a").join(bandedNew.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // ... plus shard-vs-state (state side always wins — first seen)
    val candOld =
      if (!haveState) spark.emptyDataFrame.select(lit(0L).as("doc_a"),
        lit(0L).as("doc_b")).limit(0)
      // the state side excludes ALL of the CURRENT shard's ids (base,
      // not just active — an interleaving shard can have registered a
      // shard doc's exact hash, de-activating it while its stale
      // crashed-attempt bands remain): after a crashed registration a
      // shard's bands may already sit in state when it replays, and
      // pairing a doc with itself (self-drop) or with a same-shard
      // sibling (first-seen would trump the batch keep-min order)
      // must not happen — with the filter, the replay behaves exactly
      // as if the crashed attempt never registered
      else {
        val stateB =
          if (pruned)
            VersionedStore.readValues(spark, stateBands(stateRoot), "key",
              bandedNew.select("key").distinct().collect()
                .map(_.getLong(0).toDouble).toSeq)
          else VersionedStore.read(spark, stateBands(stateRoot))
        stateB
          .join(base.select("doc_id"), Seq("doc_id"), "left_anti").as("a")
          .join(bandedNew.as("b"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
      }
    // exact Jaccard verify, candidate pairs only (doc_b is always new)
    def verify(cand: DataFrame, shA: DataFrame): DataFrame = {
      val sizesA = shA.groupBy("doc_id").agg(count(lit(1)).as("sz"))
        .toDF("doc_a", "sz_a")
      val sizesB = shNew.groupBy("doc_id").agg(count(lit(1)).as("sz"))
        .toDF("doc_b", "sz_b")
      cand
        .join(shA.toDF("doc_a", "s"), "doc_a")
        .join(shNew.toDF("doc_b", "s"), Seq("doc_b", "s"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
        .join(sizesA, "doc_a").join(sizesB, "doc_b")
        .filter(round(col("common") /
          (col("sz_a") + col("sz_b") - col("common")), 6) >= threshold)
        .select(col("doc_b").as("doc_id")).distinct()
    }
    val dropsNew = verify(candNew, shNew)
    val dropsOld =
      if (!haveState) dropsNew.limit(0)
      else if (pruned) {
        // the verify join keys state shingles by doc_a, so the prune
        // set is the candidate OLD doc ids — usually a handful, and
        // state appends arrive in ascending id order, so the shingle
        // table is naturally id-clustered even before compaction
        val cand = candOld.localCheckpoint(false)
        verify(cand, VersionedStore.readValues(spark,
          stateShingles(stateRoot), "doc_id",
          cand.select("doc_a").distinct().collect()
            .map(_.getLong(0).toDouble).toSeq))
      }
      else verify(candOld,
        VersionedStore.read(spark, stateShingles(stateRoot)))
    val survivors = active.select("doc_id")
      .join(broadcast(dropsNew.unionByName(dropsOld).distinct()),
        Seq("doc_id"), "left_anti")
      .unionByName(shortDocs.select("doc_id"))
    // Register the shard's canonicals (drops included — see scaladoc).
    // The three commits are not atomic, so ORDER is the crash story:
    // hashes commit LAST — they are the exact-match guard that makes a
    // replayed doc skip re-registration, so a crash mid-registration
    // must leave hashes unwritten or replays would permanently lose
    // the shard's bands/shingles. Re-appends after a partial crash are
    // made idempotent by filtering to doc_ids the table doesn't
    // already hold (ids are globally unique, so presence == a prior
    // attempt registered them). Nothing commits for an all-short or
    // fully-replayed shard (an empty create would poison later reads).
    // The happy path must NOT pay a state-table scan per shard: the
    // crash-residue check reads only the files whose doc_id footer
    // range intersects the shard's id range (readRange — pure manifest
    // metadata when there is no overlap, which is every non-crash
    // shard under ascending-id arrival).
    lazy val idBounds: Option[(Double, Double)] = {
      val r = active.agg(min(col("doc_id")).cast("double"),
        max(col("doc_id")).cast("double")).head()
      if (r.isNullAt(0)) None else Some((r.getDouble(0), r.getDouble(1)))
    }
    def appendFresh(df: DataFrame, root: String): Unit =
      if (!df.isEmpty) {
        if (VersionedStore.latestVersion(spark, root) < 0)
          VersionedStore.create(df, root)
        else {
          val residue = idBounds.map { case (lo, hi) =>
            VersionedStore.readRange(spark, root, "doc_id", lo, hi)
              .select("doc_id").distinct().localCheckpoint(false)
          }
          val fresh = residue match {
            case Some(seen) if !seen.isEmpty =>
              df.join(seen, Seq("doc_id"), "left_anti")
                .localCheckpoint(false)
            case _ => df
          }
          if (!fresh.isEmpty) VersionedStore.append(fresh, root)
        }
      }
    beforeRegister(survivors)
    appendFresh(shNew, stateShingles(stateRoot))
    appendFresh(bandedNew, stateBands(stateRoot))
    appendFresh(activeH.select("h", "doc_id"), stateHashes(stateRoot))
    survivors
  }

  /** Maintenance for [[dedupIncremental]] state: compact each table
    * sorted by its JOIN key — hashes by `h`, bands by `key`, shingles
    * by `doc_id` — so the footer [min, max] ranges become disjoint
    * and the `pruneStateDocs` fast path opens only the files a
    * micro-shard's keys can live in. Also collapses per-shard append
    * fragmentation. Run periodically, between shards.
    *
    * Sorting bands by `key` leaves each file's doc_id range wide;
    * that does not regress the happy-path registration guard, which
    * prunes on the NEW shard's id range sitting above all historical
    * ids under ascending-id arrival — only a crashed-shard replay
    * (overlapping ids) pays a wider residue read, and stays correct.
    */
  def compactDedupState(spark: SparkSession, stateRoot: String,
                        numFiles: Int = 64): Unit = {
    import graft.offline.VersionedStore
    def go(root: String, key: String): Unit =
      if (VersionedStore.latestVersion(spark, root) >= 0)
        VersionedStore.compact(spark, root, numFiles, sortBy = Seq(key))
    go(stateHashes(stateRoot), "h")
    go(stateBands(stateRoot), "key")
    go(stateShingles(stateRoot), "doc_id")
  }

  /** Positional shingle stream: one row per (doc, 1-based token
    * position, 64-bit hash of the n words starting there) — NOT
    * deduplicated, unlike [[shingleIndex]]: span detection needs every
    * occurrence with its position.
    */
  private def positionalShingles(docs: DataFrame, idCol: String,
                                 textCol: String, n: Int): DataFrame = {
    val refs = (0 until n).map(j => s"ws[i - 1 + $j]").mkString(", ")
    docs.select(col(idCol).as("doc_id"), Fns.words(col(textCol)).as("ws"))
      .where(size(col("ws")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(ws) - ${n - 1}), " +
          s"i -> struct(i AS pos, xxhash64(concat_ws(' ', $refs)) AS s))"))
        .as("ps"))
      .select(col("doc_id"), col("ps.pos").as("pos"), col("ps.s").as("s"))
  }

  /** EXACT SUBSTRING overlap spans: maximal runs of >= `minTokens`
    * consecutive shared tokens between document pairs — the operator
    * behind substring-level dedup (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better": remove repeated spans, not
    * whole near-dup docs). Returns (doc_a, doc_b, start_a, start_b,
    * match_len) with 1-based token starts.
    *
    * Spark-first shape instead of a suffix array: positional n-gram
    * hashes equi-join on the hash, and a shared run of consecutive
    * tokens is a run of consecutive positions on one DIAGONAL
    * (pos_a - pos_b constant) — the classic gaps-and-islands trick
    * (pos - row_number per diagonal) merges each diagonal's matches
    * into maximal spans in one window pass. Every step is an
    * equi-join / window keyed by (pair, diagonal); nothing is
    * quadratic beyond the per-shingle match fan-out, capped by
    * `maxDf`. NOTE the cap counts OCCURRENCES of a shingle across the
    * corpus (the positional stream is deliberately not per-doc
    * deduplicated), not document frequency as in [[ngramJaccard]] —
    * occurrences are what the join fans out on, so this bound is the
    * strictly tighter one, but a shingle repeated heavily inside few
    * documents trips it where ngramJaccard's doc-df cap would not.
    */
  def overlapSpans(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, minTokens: Int, maxDf: Long = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // repartition(s): the positional-shingle explode feeds the df cap
    // and both self-join sides; without an exchange below it each
    // consumer recomputes the projection (same fan-out-recompute
    // pattern as ngramJaccard/winnowPairs, same fix — the exchange is
    // the shuffle the inverted-index join needs anyway, and AQE's
    // skew-join split still applies on the reused shuffle reads).
    val sh = positionalShingles(docs, idCol, textCol, n)
      .repartition(col("s"))
    val joinSide =
      if (maxDf <= 0) sh
      else sh.join(sh.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select("s"), "s")
    val m = joinSide.as("a").join(joinSide.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pa"), col("b.pos").as("pb"),
        (col("a.pos") - col("b.pos")).as("diag"))
    val w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    m.withColumn("island", col("pa") - row_number().over(w))
      .groupBy("doc_a", "doc_b", "diag", "island")
      .agg(min("pa").cast("long").as("start_a"),
        min("pb").cast("long").as("start_b"),
        (count(lit(1)) + (n - 1)).as("match_len"))
      .filter(col("match_len") >= minTokens)
      .select("doc_a", "doc_b", "start_a", "start_b", "match_len")
  }

  /** CORPUS-GLOBAL exact-substring duplicate spans — the suffix-
    * array-family dedup of Lee et al. 2022 ("Deduplicating Training
    * Data Makes Language Models Better", ExactSubstr) re-expressed as
    * relational plans: a maximal duplicated region is a maximal RUN of
    * positions whose n-token gram occurs elsewhere in the corpus, so
    * detection needs no suffix array AND no pair enumeration — one
    * per-gram aggregate over the positional gram stream (df + first
    * occurrence, map-side combining — [[dupGramStarts]]) joined back,
    * one per-doc gaps-and-islands merge. Every
    * occurrence of a duplicated region is reported EXCEPT the
    * corpus-wide first (min (doc_id, pos) per gram — the whole corpus
    * keeps exactly one copy of each duplicated region; Lee et al.'s
    * "remove all but one occurrence" rule, decided globally rather
    * than per pair).
    *
    * vs [[overlapSpans]] (the pairwise twin): overlapSpans enumerates
    * (doc_a, doc_b) matches — the per-pair evidence, but its inverted-
    * index self-join is QUADRATIC in a gram's df (a boilerplate line
    * in 1M docs explodes; the maxDf cap trades recall to contain it).
    * Here df never multiplies anything: a gram in 1M docs costs 1M
    * aggregate input rows, period — work is positions + duplicated
    * positions, LINEAR in corpus size, independent of cluster
    * fan-out, and skew-safe (no single task ever holds one gram's
    * occurrences), which is the property that survives 100 TB. The
    * price: span evidence
    * is per occurrence, not per pair (no doc_a column), and the
    * keep-one winner is the global first occurrence rather than a
    * per-pair choice.
    *
    * Output: (doc_id, start_pos, span_tokens), 1-based token
    * positions, spans ≥ `minTokens`. Ties in the first-occurrence
    * rank cannot exist ((doc_id, pos) is unique), so the winner —
    * and therefore every span — is total-order deterministic.
    * Gram keys are the same xxhash64 positional shingles as
    * [[overlapSpans]] (the oracle replays raw gram text; a hash
    * collision merging two distinct grams is the same vanishing case
    * that family already declares).
    */
  def exactSubstrSpans(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, minTokens: Int = 8): DataFrame = {
    require(n >= 1 && minTokens >= n)
    val sh = positionalShingles(docs, idCol, textCol, n)
    dupPositionsToSpans(dupGramStarts(sh), n, minTokens)
  }

  /** Duplicate gram starts of a positional-shingle stream: every
    * (doc_id, pos) whose gram occurs elsewhere, EXCEPT the corpus-wide
    * first occurrence (min (doc_id, pos) per gram). SKEW-SAFE shape —
    * `groupBy(s).agg(count, min(struct))` joined back onto the stream
    * instead of a `Window.partitionBy(s)` df/rank pass: the aggregate
    * map-side combines (a 10⁷-occurrence boilerplate gram costs each
    * input partition ONE (s, count, min) record, not 10⁷ rows through
    * one window task) and the join-back is an equi-join AQE's skew
    * split can cut, where a window partition is indivisible. Identical
    * answer (spec-held vs [[exactSubstrSpansWindowed]]): dup ⇔
    * df ≥ 2 ∧ (doc_id, pos) ≠ first — struct min IS the (doc_id, pos)
    * lexicographic first, and singleton grams never survive the
    * df ≥ 2 filter, so the join's build side carries only duplicated
    * gram keys. */
  private def dupGramStarts(sh: DataFrame): DataFrame = {
    val firsts = sh.groupBy("s")
      .agg(count(lit(1)).as("df"),
        min(struct(col("doc_id"), col("pos"))).as("first_occ"))
      .filter(col("df") >= 2)
      .select("s", "first_occ")
    sh.join(firsts, Seq("s"))
      .filter(!(col("doc_id") === col("first_occ.doc_id") &&
        col("pos") === col("first_occ.pos")))
      .select("doc_id", "pos")
  }

  /** The round-11 window-shaped detector, kept as the equality twin
    * [[dupGramStarts]] is spec-held against (one `Window.partitionBy
    * (s)` df + first-occurrence-rank pass — same answer, but a hot
    * gram's occurrences all serialize through one window task, the
    * 100 TB straggler surface the aggregation shape removes). */
  private[graft] def exactSubstrSpansWindowed(docs: DataFrame,
                                              idCol: String,
                                              textCol: String,
                                              n: Int = 3,
                                              minTokens: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1 && minTokens >= n)
    val sh = positionalShingles(docs, idCol, textCol, n)
    val wG = Window.partitionBy("s")
    val marked = sh
      .withColumn("df", count(lit(1)).over(wG))
      .withColumn("rn", row_number().over(wG.orderBy("doc_id", "pos")))
    val dups = marked.filter(col("df") >= 2 && col("rn") > 1)
      .select("doc_id", "pos")
    dupPositionsToSpans(dups, n, minTokens)
  }

  /** Shared islands merge for the ExactSubstr family: duplicate
    * (doc_id, pos) gram starts → maximal per-doc spans
    * (start_pos, span_tokens), spans ≥ `minTokens` — the
    * gaps-and-islands pass both the batch and the incremental
    * detectors end on, factored so the two cannot drift. */
  private def dupPositionsToSpans(dups: DataFrame, n: Int,
                                  minTokens: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wD = Window.partitionBy("doc_id").orderBy("pos")
    dups.withColumn("island", col("pos") - row_number().over(wD))
      .groupBy("doc_id", "island")
      .agg(min("pos").cast("long").as("start_pos"),
        (count(lit(1)) + (n - 1)).as("span_tokens"))
      .filter(col("span_tokens") >= minTokens)
      .select("doc_id", "start_pos", "span_tokens")
  }

  /** The ExactSubstr ACTION: cut every [[exactSubstrSpans]] span from
    * its document (the global first occurrence of each duplicated
    * region survives by construction — it is never reported as a
    * span), returning (doc_id, text_clean) for every input document.
    * Composes [[stripSpans]]' merged-range token filter, so
    * overlapping spans cut once and span-free docs pass through. */
  def exactSubstrDedup(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, minTokens: Int = 8): DataFrame =
    stripSpans(docs, idCol, textCol,
      exactSubstrSpans(docs, idCol, textCol, n, minTokens)
        .select(col("doc_id").as("doc_b"), col("start_pos").as("start_b"),
          col("span_tokens").as("match_len")))

  /** INCREMENTAL ExactSubstr detection: duplicate spans of `shardDocs`
    * measured AGAINST an already-kept corpus plus within the shard
    * itself — the daily-ingest shape of [[exactSubstrSpans]] (new data
    * arrives; the released corpus is immutable and must not be
    * rescanned). A shard gram start is a duplicate iff its n-gram
    * occurs in the corpus (ANY shard occurrence repeats a region the
    * corpus already keeps) OR repeats within the shard (the batch
    * first-occurrence rule, applied shard-locally).
    *
    * Semantics vs running the batch detector over corpus ∪ shard and
    * keeping the shard rows: identical EXCEPT keeper choice — here the
    * corpus's existing copy is ALWAYS the keeper (keeper stability:
    * released data is never retro-edited), where the batch global
    * (doc_id, pos) order could elect a shard doc instead. On shards
    * whose ids order after the corpus the two coincide exactly
    * (spec-held).
    *
    * Plan shape: the corpus enters as ONE hash equi-join on the gram
    * key (left-outer onto the shard's positional stream) — linear,
    * fan-out-free, and keyed identically to the shard-local
    * first-occurrence aggregate join that follows, so the two share
    * one exchange and both are AQE-skew-splittable.
    * `corpusDocs` is shingled and deduplicated here; at scale use the
    * persisted gram store ([[substrSpansIncremental]]) so the corpus
    * is never rescanned.
    */
  def exactSubstrSpansAgainst(corpusDocs: DataFrame, shardDocs: DataFrame,
                              idCol: String, textCol: String,
                              n: Int = 3, minTokens: Int = 8): DataFrame =
    spansAgainstGrams(
      positionalShingles(corpusDocs, idCol, textCol, n)
        .select("s").distinct(),
      shardDocs, idCol, textCol, n, minTokens)

  /** The incremental ACTION: strip every [[exactSubstrSpansAgainst]]
    * span from its shard document — every shard doc comes back,
    * duplicated regions cut, the corpus's copies untouched (they are
    * not even read beyond their gram set). */
  def exactSubstrDedupAgainst(corpusDocs: DataFrame, shardDocs: DataFrame,
                              idCol: String, textCol: String,
                              n: Int = 3, minTokens: Int = 8): DataFrame =
    stripSpans(shardDocs, idCol, textCol,
      exactSubstrSpansAgainst(corpusDocs, shardDocs, idCol, textCol,
        n, minTokens)
        .select(col("doc_id").as("doc_b"), col("start_pos").as("start_b"),
          col("span_tokens").as("match_len")))

  private def spansAgainstGrams(corpusGrams: DataFrame,
                                shardDocs: DataFrame,
                                idCol: String, textCol: String,
                                n: Int, minTokens: Int): DataFrame = {
    require(n >= 1 && minTokens >= n)
    val sh = positionalShingles(shardDocs, idCol, textCol, n)
    // Skew-safe shape (round 12): the corpus-membership join runs on
    // the PER-GRAM aggregate (one row per distinct shard gram — keys
    // unique, skew structurally impossible), not on the occurrence
    // stream. The round-11 form chained two per-occurrence left-outer
    // SMJs on s in one stage, where a hot gram's occurrences land in
    // one indivisible partition AND AQE's skew split cannot fire (no
    // shuffle boundary between the chained joins — probe-verified).
    // Here the only per-occurrence join is the final join-back onto
    // gramInfo, which is filtered to interesting grams (usually
    // broadcast → no stream shuffle at all; when corpus-sized, a
    // single SMJ whose both children are shuffle stages — exactly the
    // shape OptimizeSkewedJoin handles).
    val gramInfo = sh.groupBy("s")
      .agg(count(lit(1)).as("df"),
        min(struct(col("doc_id"), col("pos"))).as("first_occ"))
      .join(corpusGrams.select(col("s"), lit(true).as("in_corpus")),
        Seq("s"), "left_outer")
      .filter(col("in_corpus").isNotNull || col("df") >= 2)
      .select("s", "first_occ", "in_corpus")
    val dups = sh
      .join(gramInfo, Seq("s"))
      .filter(col("in_corpus").isNotNull ||
        !(col("doc_id") === col("first_occ.doc_id") &&
          col("pos") === col("first_occ.pos")))
      .select("doc_id", "pos")
    dupPositionsToSpans(dups, n, minTokens)
  }

  // --- persisted ExactSubstr gram store (incremental refresh) -------

  private def substrGramsTable(root: String) = s"$root/grams"
  private def substrParamsTable(root: String) = s"$root/params"
  private def substrAppliedTable(root: String) = s"$root/applied"

  /** Build and PERSIST the ExactSubstr gram-count model as
    * VersionedStore tables under `root`: `grams` (s, df — the
    * xxhash64 positional-gram key and its corpus occurrence count,
    * range-laid-out and sorted on s so a refresh MERGE prunes files),
    * `params` (n) and `applied` (the shard ledger). Counts are
    * ADDITIVE, so the store refreshes shard-at-a-time
    * ([[upsertSubstrShard]]) without ever rescanning the corpus —
    * the Dsir/CM count-store contract applied to the gram vocabulary,
    * making daily ExactSubstr dedup a join against kilobyte-pruned
    * store files instead of a full-corpus re-shingle.
    */
  def buildSubstrStore(docs: DataFrame, idCol: String, textCol: String,
                       root: String, n: Int = 3,
                       filesHint: Int = 32): Unit = {
    import graft.offline.VersionedStore
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = positionalShingles(docs, idCol, textCol, n)
      .groupBy("s").agg(count(lit(1)).as("df"))
    VersionedStore.overwrite(
      grams.repartitionByRange(math.max(1, filesHint), col("s"))
        .sortWithinPartitions("s"),
      substrGramsTable(root))
    VersionedStore.overwrite(Seq(n.toLong).toDF("n"),
      substrParamsTable(root))
    VersionedStore.overwrite(Seq("__init__").toDF("shard_id"),
      substrAppliedTable(root))
  }

  private def readSubstrN(spark: org.apache.spark.sql.SparkSession,
                          root: String): Int =
    graft.offline.VersionedStore.read(spark, substrParamsTable(root))
      .head().getLong(0).toInt

  /** Fold ONE new shard's gram counts into the store: a keyed MERGE
    * on `s` rewriting only the files whose key ranges the shard
    * touches. EXACTLY-ONCE, not just at-least-once-with-dedup: the
    * usual counts-first/ledger-last ordering leaves a crash window
    * where a replayed shard double-counts — benign for a one-sided
    * estimator, but this store's df counts are declared EXACT (the
    * freeze artifact's minDf gate reads them), so ingest runs the
    * same intent/done protocol as [[retractSubstrShard]]: an INTENT
    * row carrying the expected post-ingest total lands first, the
    * merge second, the DONE row last. A replayed crash compares the
    * store total against the intent and either just finishes the
    * ledger, redoes the merge, or fails LOUDLY on an interleaved
    * writer. Detect BEFORE ingesting: run [[substrSpansIncremental]]
    * on a shard before upserting it, else the shard's own grams read
    * as "already kept" and its first copies get cut too. Returns
    * whether the shard was applied.
    */
  def upsertSubstrShard(shardDocs: DataFrame, idCol: String,
                        textCol: String, root: String,
                        shardId: String): Boolean = {
    import graft.offline.Ledger
    val spark = shardDocs.sparkSession
    Ledger.requireFrameFree(shardId)
    if (Ledger.isApplied(spark, substrAppliedTable(root), shardId))
      return false // replays answer before any params/shingle work
    val n = readSubstrN(spark, root)
    Ledger.ingestOnce(spark, substrAppliedTable(root),
      substrGramsTable(root), Seq("s"), Seq("df"),
      positionalShingles(shardDocs, idCol, textCol, n)
        .groupBy("s").agg(count(lit(1)).as("df")),
      shardId)
  }

  /** Retract one previously-ingested shard from the gram store — the
    * right-to-be-forgotten path every additive count store in the
    * engine carries ([[Sketch.retractCm]]'s protocol verbatim, same
    * guarantees): gram counts subtract EXACTLY, exhausted grams are
    * deleted, so the latest version equals a store that never saw the
    * shard (pre-retraction snapshots stay readable via `versionAsOf`
    * until the caller vacuums — the engine's compliance convention).
    * Crash safety: INTENT row (carrying the exact expected
    * post-retraction total) before the cell merge, DONE row after; a
    * retried crash compares totals and either finishes the ledger,
    * redoes the merge, or fails LOUDLY on an interleaved writer.
    * Retracting a shard not currently applied returns false
    * (generation-counted, so ingest→retract→ingest cycles work). */
  def retractSubstrShard(shardDocs: DataFrame, idCol: String,
                         textCol: String, root: String,
                         shardId: String): Boolean = {
    import graft.offline.Ledger
    val spark = shardDocs.sparkSession
    val n = readSubstrN(spark, root)
    Ledger.retractOnce(spark, substrAppliedTable(root),
      substrGramsTable(root), Seq("s"), Seq("df"),
      positionalShingles(shardDocs, idCol, textCol, n)
        .groupBy("s").agg(count(lit(1)).as("df")),
      shardId)
  }

  /** Incremental detection served FROM the store: spans of
    * `shardDocs` against every gram ever ingested — bit-equal to
    * [[exactSubstrSpansAgainst]] over the union of the ingested
    * shards (membership is all detection needs; df comes along for
    * [[freezeDupGramsFromStore]]). The corpus itself is never read. */
  def substrSpansIncremental(shardDocs: DataFrame, idCol: String,
                             textCol: String, root: String,
                             minTokens: Int = 8): DataFrame = {
    val spark = shardDocs.sparkSession
    // df > 0: a crash-window zero-count residue row (retraction of
    // the store's final shard — deleteKeys cannot empty a table) is
    // NOT membership
    spansAgainstGrams(
      graft.offline.VersionedStore.read(spark, substrGramsTable(root))
        .filter(col("df") > 0),
      shardDocs, idCol, textCol, readSubstrN(spark, root), minTokens)
  }

  /** The store-served ACTION: [[substrSpansIncremental]] spans cut
    * from the shard via the shared merged-range strip. */
  def substrDedupIncremental(shardDocs: DataFrame, idCol: String,
                             textCol: String, root: String,
                             minTokens: Int = 8): DataFrame =
    stripSpans(shardDocs, idCol, textCol,
      substrSpansIncremental(shardDocs, idCol, textCol, root, minTokens)
        .select(col("doc_id").as("doc_b"), col("start_pos").as("start_b"),
          col("span_tokens").as("match_len")))

  /** Freeze the [[exactSubstrFrozen]] artifact straight from the
    * persisted counts — no corpus scan, bit-equal to
    * [[freezeDupGrams]] over the union of every ingested shard
    * (counts are exact additive longs). */
  def freezeDupGramsFromStore(spark: org.apache.spark.sql.SparkSession,
                              root: String,
                              minDf: Long = 2L): Array[Long] =
    graft.offline.VersionedStore.read(spark, substrGramsTable(root))
      .filter(col("df") >= minDf)
      .select("s").collect().map(_.getLong(0))

  /** Freeze the duplicated-gram artifact for [[exactSubstrFrozen]]:
    * the xxhash64 positional-gram hashes occurring ≥ `minDf` times in
    * the offline corpus (same hash family as [[exactSubstrSpans]]'
    * detection, so the two agree on identity). Two dials:
    * `minDf = 1` freezes EVERY corpus gram — the dedup-vs-corpus
    * mode, where any stream occurrence is a repeat of something the
    * corpus already keeps; `minDf ≥ 2` freezes only corpus-internal
    * duplicates — the boilerplate-removal mode, with a far smaller
    * artifact. Driver-bounded by qualifying gram TYPES (the
    * freezeEvalShingles contract — size minDf to what the driver
    * holds; at minDf = 1 this is the corpus's full gram vocabulary —
    * use [[freezeDupGramsBloom]] there, whose artifact is mBits/8
    * bytes regardless of corpus size).
    */
  def freezeDupGrams(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, minDf: Long = 2L): Array[Long] =
    positionalShingles(docs, idCol, textCol, n)
      .groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select("s").collect().map(_.getLong(0))

  /** STREAMING-SAFE ExactSubstr strip against a frozen gram set: one
    * pure projection — per row, flag each gram start whose hash is in
    * the frozen set (literal-map probe), cut every token covered by a
    * flagged gram, reassemble. No explode, no join, no aggregation —
    * runs in a stream's append mode with zero state (the
    * decontaminateFrozen shape applied to the ACTION, not just the
    * score).
    *
    * Semantics vs the batch [[exactSubstrDedup]]: the frozen set
    * stands in for "this region already exists" — no first-occurrence
    * exemption (the freeze-time corpus already keeps its one copy),
    * and cuts happen at gram granularity (every flagged-gram token
    * goes, i.e. the batch policy at minTokens = n). On documents
    * DISJOINT from the freeze corpus with no internal repetition,
    * this EQUALS the batch action over corpus ∪ docs restricted to
    * docs at minTokens = n with minDf = 1 (spec-held); duplicates
    * arriving twice WITHIN the stream are invisible to the frozen
    * artifact — the standing frozen-twin contract (state lives in
    * the offline freeze, refreshed on the caller's cadence).
    */
  def exactSubstrFrozen(docs: DataFrame, idCol: String, textCol: String,
                        frozenGrams: Array[Long], n: Int = 3): DataFrame = {
    val mdl = map_from_arrays(lit(frozenGrams),
      lit(Array.fill(frozenGrams.length)(true)))
    frozenStripWith(docs, idCol, textCol, n, "__frz", mdl,
      h => s"__frz[$h] IS NOT NULL")
  }

  /** Shared skeleton of the frozen-strip twins: per gram start, a
    * caller-supplied SQL flag over the gram's xxhash64 (the exact-set
    * map probe or the bloom-bitset probe), then the covered-token cut
    * and reassembly — one pure projection, stream-safe. `artifact` is
    * bound to `artifactName` so the flag SQL can reference it. */
  private def frozenStripWith(docs: DataFrame, idCol: String,
                              textCol: String, n: Int,
                              artifactName: String, artifact: Column,
                              flagSql: String => String): DataFrame = {
    val refs = (0 until n).map(j => s"ws[s - 1 + $j]").mkString(", ")
    val gramHash = s"xxhash64(concat_ws(' ', $refs))"
    docs
      .select(col(idCol).as("doc_id"),
        coalesce(Fns.words(col(textCol)),
          array().cast("array<string>")).as("ws"))
      .withColumn(artifactName, artifact)
      // one flag per gram start: is this n-gram in the frozen set
      .withColumn("flags",
        when(size(col("ws")) >= n, expr(
          s"transform(sequence(1, size(ws) - ${n - 1}), " +
            s"s -> ${flagSql(gramHash)})"))
          .otherwise(array().cast("array<boolean>")))
      // cut token t iff ANY gram covering it (starts t-n+1..t) is
      // flagged; with >= 1 gram the start range is always ascending
      // (lo = max(1, t-n+1) <= min(|flags|, t) = hi), and the empty-
      // flags guard dodges sequence()'s descending-range trap
      .withColumn("text_clean", concat_ws(" ", expr(
        s"""filter(
           |  transform(ws, (w, i0) ->
           |    IF(size(flags) >= 1 AND
           |       exists(sequence(greatest(1, i0 + 1 - ${n - 1}),
           |                       least(size(flags), i0 + 1)),
           |              s -> flags[s - 1]), NULL, w)),
           |  w -> w IS NOT NULL)""".stripMargin)))
      .select("doc_id", "text_clean")
  }

  /** BOUNDED frozen ExactSubstr artifact (round 12 — the r11
    * verdict's #2): the frozen gram set compiled to a Bloom bitset of
    * caller-sized `mBits` bits, built from the PERSISTED gram store
    * with zero corpus scan. This is the minDf = 1 dedup-vs-corpus
    * mode's scale path: [[freezeDupGramsFromStore]] at minDf = 1
    * collects the corpus's FULL gram vocabulary to the driver
    * (unbounded in corpus size); this artifact is mBits/8 bytes no
    * matter how many grams qualify — size it to the false-positive
    * rate, not the corpus.
    *
    * Hash family: seed-salted xxhash64 over the gram's xxhash64 key
    * ([[Sketch.bloomPositionsXx]], fast = true) — build and probe
    * must agree, which [[exactSubstrFrozenBloom]] replays exactly.
    */
  def freezeDupGramsBloom(spark: org.apache.spark.sql.SparkSession,
                          root: String, mBits: Int, kHashes: Int = 2,
                          minDf: Long = 1L): Array[Long] = {
    require(mBits >= 64 && kHashes >= 1)
    Sketch.bloomBitsetWords(
      graft.offline.VersionedStore.read(spark, substrGramsTable(root))
        .filter(col("df") >= math.max(minDf, 1L)),
      "s", mBits, kHashes, fast = true)
  }

  /** STREAMING-SAFE ExactSubstr strip against a BLOOM-frozen gram
    * set: [[exactSubstrFrozen]]'s projection with the literal-map
    * probe replaced by pure bit arithmetic over
    * [[freezeDupGramsBloom]]'s bitset — still one projection, zero
    * state, append-mode safe. ONE-SIDED contract (spec-held): a gram
    * in the frozen set ALWAYS probes true (no false negatives — every
    * token [[exactSubstrFrozen]] cuts, this cuts), and a false
    * positive OVER-CUTS at the classic Bloom rate
    * ≈ (1 - e^(-kHashes·nGrams/mBits))^kHashes — the dedup-direction
    * error (losing a few extra tokens) a 100 TB stream dedup accepts
    * in exchange for a fixed-size artifact. */
  def exactSubstrFrozenBloom(docs: DataFrame, idCol: String,
                             textCol: String, bloomWords: Array[Long],
                             mBits: Int, kHashes: Int = 2,
                             n: Int = 3): DataFrame = {
    require(bloomWords.length == (mBits + 63) / 64,
      s"bitset has ${bloomWords.length} words; mBits=$mBits needs " +
        s"${(mBits + 63) / 64}")
    frozenStripWith(docs, idCol, textCol, n, "__blm", lit(bloomWords),
      h => (0 until kHashes).map { i =>
        val pos = s"pmod(xxhash64($i, $h), CAST($mBits AS BIGINT))"
        s"((shiftright(element_at(__blm, CAST(($pos) DIV 64 AS INT) + 1), " +
          s"CAST(($pos) % 64 AS INT)) & 1) = 1)"
      }.mkString("(", " AND ", ")"))
  }

  /** The substring-dedup ACTION: remove [[overlapSpans]] matches from
    * each pair's HIGHER doc id (keep-min convention — doc_a keeps its
    * copy, doc_b loses the span), returning (doc_id, text_clean) for
    * every input document. This is span-level dedup per Lee et al.:
    * the document survives, only its duplicated substrings go.
    *
    * Per-doc overlapping/adjacent cut ranges are merged with a
    * running-max gaps-and-islands window (a token covered by two
    * different partners is removed once), then tokens are filtered by
    * position in one codegen-friendly higher-order expression — no
    * per-row UDF, no driver loop. Docs with no spans pass through
    * with text unchanged (left join).
    */
  def stripSpans(docs: DataFrame, idCol: String, textCol: String,
                 spans: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranges = spans.select(col("doc_b").as("doc_id"),
      col("start_b").as("s"),
      (col("start_b") + col("match_len")).as("e")) // [s, e) token range
    val w = Window.partitionBy("doc_id").orderBy("s")
    val merged = ranges
      .withColumn("maxe",
        max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("fresh",
        when(col("maxe").isNull || col("s") > col("maxe"), 1).otherwise(0))
      .withColumn("island", sum("fresh").over(w))
      .groupBy("doc_id", "island")
      .agg(min("s").as("s"), max("e").as("e"))
    val perDoc = merged.groupBy("doc_id")
      .agg(collect_list(struct(col("s"), col("e"))).as("cuts"))
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .withColumn("text_clean",
        when(col("cuts").isNull, col("text")).otherwise(concat_ws(" ",
          expr("filter(transform(split(text, ' '), " +
            "(t, i) -> IF(exists(cuts, c -> i + 1 >= c.s AND i + 1 < c.e), " +
            "NULL, t)), t -> t IS NOT NULL)"))))
      .select(col("doc_id"), col("text_clean"))
  }

  /** Training-data DECONTAMINATION: find training documents whose
    * word-n-gram overlap with a benchmark/eval set is at least
    * `minOverlap` distinct shingles — the standard guard against eval
    * leakage in a pretraining corpus (the eval set's n-grams must not
    * be memorizable from training data).
    *
    * Scale shape: the EVAL side is small (benchmarks are thousands of
    * docs, the corpus is billions), so its distinct shingle set is
    * broadcast and the corpus-side shingle stream equi-joins it
    * map-side — the corpus never shuffles until the per-doc overlap
    * count, which only carries matched rows. Shingles are the same
    * codegen'd 64-bit hashes the dedup family uses (ShingleHash):
    * per-doc distinct, so count(*) IS the distinct-overlap count.
    *
    * Returns (doc_id, n_overlap) for contaminated training docs; anti-
    * join the corpus against it to scrub.
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    evalDocs: DataFrame, evalIdCol: String,
                    evalTextCol: String, n: Int,
                    minOverlap: Long = 1L): DataFrame = {
    val evalShingles = evalDocs.select(
      explode(graft.functions.ShingleHash.shingles(col(evalTextCol), n))
        .as("s")).distinct()
    val docShingles = docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.ShingleHash.shingles(col(textCol), n)).as("s"))
    docShingles.join(broadcast(evalShingles), Seq("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Derive the FROZEN decontamination artifact for
    * [[decontaminateFrozen]]: the eval corpus's distinct shingle-hash
    * set (same ShingleHash family as [[decontaminate]]'s join keys).
    * Eval sets are small by nature (benchmarks are thousands of docs
    * — the broadcast assumption [[decontaminate]] already makes), so
    * the set collects to the driver; sorted for a deterministic
    * artifact that can be persisted and diffed.
    */
  def freezeEvalShingles(evalDocs: DataFrame, evalTextCol: String,
                         n: Int): Array[Long] =
    evalDocs.select(
        explode(graft.functions.ShingleHash.shingles(col(evalTextCol), n))
          .as("s")).distinct()
      .collect().map(_.getLong(0)).sorted

  /** Streaming-safe decontamination twin: score each document against
    * a frozen eval shingle set ([[freezeEvalShingles]]) in ONE pass —
    * a codegen'd hash-set probe per shingle (ShingleOverlap), no
    * explode, no join, no aggregation — so the plan is a pure
    * projection that runs identically on a stream (ingest-time
    * contamination tagging) and in batch. Given the same eval set,
    * output rows equal [[decontaminate]]'s exactly: both count
    * per-doc DISTINCT shingle hashes in the eval set. NULL text
    * yields no row, matching the batch explode semantics.
    */
  def decontaminateFrozen(docs: DataFrame, idCol: String, textCol: String,
                          frozenShingles: Array[Long], n: Int,
                          minOverlap: Long = 1L): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        graft.functions.ShingleHash.overlapCount(col(textCol), n,
          frozenShingles.toSeq).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)

  /** Repeated-line removal — the RefinedWeb/CCNet boilerplate pass:
    * a line occurring in >= `maxDf` DISTINCT documents (nav bars,
    * cookie banners, "subscribe" footers, copyright lines) is cut
    * from every document; everything else survives with its original
    * line order. Lines shorter than `minChars` are never cut — blank
    * separators and one-word lines are hyper-frequent but structural,
    * not boilerplate. Emits one row per input document (docs whose
    * every line was cut come back with empty text, not dropped):
    * (doc_id, text_clean, n_lines, n_dropped).
    *
    * Scale shape: frequency is aggregated on md5(line) — a fixed
    * 32-char shuffle key instead of arbitrary-length line text — and
    * the frequent-line set is bounded above by total_lines/maxDf, a
    * tiny fraction of the corpus, so AQE broadcasts the anti-join at
    * any realistic maxDf. Two real shuffles: the line-frequency agg
    * (map-side combinable) and the per-document reassembly; per-doc
    * state is one line array — bounded by document size, not corpus.
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
                maxDf: Int = 10, minChars: Int = 5): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    val spine = docs.select(col(idCol).as("doc_id"),
      split(coalesce(col(textCol), lit("")), "\n", -1).as("ls"))
    val lines = spine
      .select(col("doc_id"), posexplode(col("ls")).as(Seq("pos", "line")))
      .withColumn("lk", md5(col("line")))
    // two-level distinct-doc count (no count_distinct Expand): the
    // (lk, doc) partial collapses a document's repeated lines
    // map-side before anything shuffles
    val frequent = lines.filter(length(col("line")) >= minChars)
      .groupBy("lk", "doc_id").agg(count(lit(1)).as("occ"))
      .groupBy("lk").agg(count(lit(1)).as("df"))
      .filter(col("df") >= maxDf).select("lk")
    val rebuilt = lines.join(frequent, Seq("lk"), "left_anti")
      .groupBy("doc_id").agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), "\n").as("text_clean"),
        count(lit(1)).as("n_kept"))
    spine.select(col("doc_id"), size(col("ls")).cast("long").as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped"))
  }

  /** Per-document decontamination SCORES — the graded companion to
    * [[decontaminate]]'s absolute gate: every training doc that has
    * shingles gets (n_shingles, n_overlap, contam_frac), where
    * contam_frac = shared distinct n-grams / the doc's distinct
    * n-grams — the quantity real pipelines threshold on ("drop if
    * >10% of the doc overlaps eval"). Docs shorter than n words have
    * no shingles and no row, same as the gate.
    *
    * Same asymmetric shape as the gate: the eval shingle set is tiny
    * and broadcast, the corpus side computes its per-doc totals
    * map-side-combinably and never shuffles for the probe join.
    */
  def decontaminationScores(docs: DataFrame, idCol: String,
                            textCol: String, evalDocs: DataFrame,
                            evalIdCol: String, evalTextCol: String,
                            n: Int): DataFrame = {
    val evalShingles = evalDocs.select(
      explode(graft.functions.ShingleHash.shingles(col(evalTextCol), n))
        .as("s")).distinct()
    // per-doc DISTINCT shingles by construction (ShingleHash dedupes)
    val docShingles = docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.ShingleHash.shingles(col(textCol), n)).as("s"))
    val totals = docShingles.groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"))
    val overlaps = docShingles.join(broadcast(evalShingles), Seq("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    totals.join(overlaps, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n_overlap"), lit(0L)) / col("n_shingles"), 6)
          .as("contam_frac"))
  }

  /** Derive [[lineDedup]]'s frequent-line set as a FROZEN artifact:
    * the md5 keys of every line occurring in >= `maxDf` distinct
    * documents (minChars-short lines excluded, matching the batch
    * pass). Sorted for determinism. Bounded above by
    * total_lines/maxDf — the same bounded-artifact caveat as
    * freezeVocabulary: fine as a broadcast literal at any realistic
    * maxDf, and the knob to shrink it is raising maxDf.
    */
  def freezeFrequentLines(docs: DataFrame, idCol: String,
                          textCol: String, maxDf: Int = 10,
                          minChars: Int = 5): Array[String] = {
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    docs.select(col(idCol).as("doc_id"),
        explode(split(coalesce(col(textCol), lit("")), "\n", -1))
          .as("line"))
      .filter(length(col("line")) >= minChars)
      .groupBy(md5(col("line")).as("lk"), col("doc_id"))
      .agg(count(lit(1)).as("occ"))
      .groupBy("lk").agg(count(lit(1)).as("df"))
      .filter(col("df") >= maxDf)
      .select("lk").collect().map(_.getString(0)).sorted
  }

  /** The STREAMING-SAFE twin of [[lineDedup]]: cut lines whose md5 is
    * in the frozen frequent-line set. Pure projection — no
    * frequency aggregate, no reassembly shuffle, no state — so it
    * runs per micro-batch in Structured Streaming and at parquet-scan
    * speed in batch. Given the frozen set derived from the same
    * corpus (same maxDf/minChars), the output equals [[lineDedup]]'s
    * row for row.
    */
  def lineDedupFrozen(docs: DataFrame, idCol: String, textCol: String,
                      frozenLineKeys: Array[String]): DataFrame = {
    val frozen = typedLit(frozenLineKeys.toSeq)
    docs.select(col(idCol).as("doc_id"),
        split(coalesce(col(textCol), lit("")), "\n", -1).as("ls"))
      .select(col("doc_id"),
        filter(col("ls"), l => !array_contains(frozen, md5(l)))
          .as("kept"),
        size(col("ls")).cast("long").as("n_lines"))
      .select(col("doc_id"),
        array_join(col("kept"), "\n").as("text_clean"),
        col("n_lines"),
        (col("n_lines") - size(col("kept")).cast("long"))
          .as("n_dropped"))
  }

  /** Embedding-cosine near-dup pairs above `threshold` — exact, via a
    * block-partitioned self-join instead of a broadcast nested loop.
    * Each side is split into `nBlocks` id-hash blocks; the left side
    * is replicated across partner blocks and joined on the composite
    * (block_a, block_b) key, so the O(n²) compare distributes evenly
    * over nBlocks² equi-join buckets with n/nBlocks rows a side — no
    * driver broadcast of the corpus, bounded executor memory, and the
    * plan is a shuffle join Catalyst can run at any n.
    *
    * Why exact and not LSH here: at moderate thresholds (the declared
    * 0.4) a sign-LSH bit agrees with prob 0.63 for a qualifying pair
    * vs 0.5 for background — no useful pruning exists, so candidate
    * generation degenerates to all pairs anyway. For high thresholds
    * (≥ ~0.8) use embeddingCosineLsh, which prunes hard.
    *
    * Norms are computed ONCE per vector (n rows), not per pair (n²):
    * cosine(a,b) = dot(a,b)/(norm_a*norm_b) with norm = sqrt(dot(v,v))
    * — the same doubles the per-pair formula yields, 3× less work.
    */
  def embeddingCosine(emb: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, nBlocks: Int = 16): DataFrame = {
    import graft.functions.VectorExpressions.dotF
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      Fns.l2Norm(col(vecCol)).as("nrm"))
    roundedCosineAtLeast(blockedSelfPairs(base, Nil, nBlocks),
        dotF(col("va"), col("vb")) / (col("nrm_a") * col("nrm_b")),
        threshold)
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"), col("cosine"))
  }

  /** THE triangular-blocked SELF-pairing — one code path for every
    * all-pairs vector scan (embeddingCosine, embeddingSemdedup and
    * its incremental batch, Kmeans.semdedupPairs — four former
    * copies). `df` must carry (id, v, nrm) plus `keyCols`; each
    * UNORDERED same-key pair comes back exactly once as (keyCols…,
    * id_a, va, nrm_a, id_b, vb, nrm_b) with NO id order guaranteed —
    * callers normalize with least/greatest.
    *
    * Why blocked: a hot key in a SELF-join lives in the hot partition
    * of BOTH sides, so AQE's skew split (which must duplicate one
    * side) can never fire (hotcell probe, SCALE_NOTES round 12). The
    * A side covers buckets (blk, j ≥ blk), the B side (i ≤ blk, blk):
    * each pair meets in exactly ONE of the nBlocks·(nBlocks+1)/2
    * buckets; the diagonal keeps a pair once via the id inequality.
    *
    * COST, declared: each side replicates ~(nBlocks+1)/2× into the
    * shuffle — the classic all-pairs replication trade. Right when
    * pair volume dominates (it always does at corpus scale: output
    * is quadratic in key-group size); for tiny or known-unskewed
    * inputs pass nBlocks = 1 to opt out (the measured default-regime
    * overhead at probe scale is the scheduling floor, ~0.5 s).
    */
  /** `cosine = round(raw, 6); keep cosine >= threshold` with a cheap
    * conservative prefilter, so the per-pair BigDecimal `round`
    * (Spark's double round builds a BigDecimal from Double.toString
    * PER ROW) runs only on pairs that can possibly survive:
    * round(x, 6) moves x by at most 5e-7 plus a half-ulp, so any
    * pair with raw < threshold − 1e-6 cannot round to ≥ threshold.
    * The final filter is the UNCHANGED exact predicate (Catalyst
    * combines the two filters keeping the cheap one first, and And
    * short-circuits), so the kept pairs and their cosine values are
    * identical — the prefilter only skips the rounding work on the
    * ~all pairs nowhere near the threshold (the pair scan is
    * quadratic; survivors are not). */
  private[operators] def roundedCosineAtLeast(pairs: DataFrame,
                                              raw: Column,
                                              threshold: Double)
  : DataFrame =
    pairs
      .filter(raw >= threshold - 1e-6)
      .withColumn("cosine", round(raw, 6))
      .filter(col("cosine") >= threshold)

  private[graft] def blockedSelfPairs(df: DataFrame, keyCols: Seq[String],
                                      nBlocks: Int): DataFrame = {
    require(nBlocks >= 1)
    val based = df.withColumn("blk", pmod(hash(col("id")), lit(nBlocks)))
    val partners = array((0 until nBlocks).map(lit(_)): _*)
    val a = based.select(keyCols.map(col) ++ Seq(col("id").as("id_a"),
      col("v").as("va"), col("nrm").as("nrm_a"), col("blk").as("blk_a"),
      explode(filter(partners, j => j >= col("blk"))).as("blk_b")): _*)
    val b = based.select(keyCols.map(col) ++ Seq(col("id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nrm_b"),
      explode(filter(partners, i => i <= col("blk"))).as("blk_a"),
      col("blk").as("blk_b")): _*)
    // The pair join is OUTPUT-dominated: kilobytes of vectors fan out
    // to a quadratic pair stream inside the join stage, so AQE's
    // byte-based partition coalescing (which only sees the tiny
    // shuffle INPUT) folds it to ~one partition and serializes the
    // whole scan — the round-15 bench measured q_gramvec_pairs flat
    // from 8 to 32 cores for exactly this reason. Repartitioning both
    // sides by the join key with an EXPLICIT count (user-specified
    // repartitions are exempt from AQE coalescing) pins the pair
    // stage at the session shuffle-partition knob; the join reuses
    // the partitioning, so the exchange count is unchanged. Effective
    // parallelism is still capped by the nBlocks·(nBlocks+1)/2
    // triangular keys — size nBlocks to the cluster, as before.
    val jk = keyCols ++ Seq("blk_a", "blk_b")
    val (ar, br) =
      if (nBlocks == 1) (a, b)
      else (graft.functions.Fns.pinnedRepartition(a, jk.map(col): _*),
            graft.functions.Fns.pinnedRepartition(b, jk.map(col): _*))
    ar.join(br, jk)
      .filter(col("blk_a") =!= col("blk_b") || col("id_a") < col("id_b"))
      .drop("blk_a", "blk_b")
  }

  /** Embedding near-dup pairs via multi-table sign-LSH candidates plus
    * exact cosine verification — the scale path for HIGH thresholds
    * (cosine ≥ ~0.8), where each deterministic hyperplane bit agrees
    * with probability ≥ 0.8 for a true pair vs 0.5 for background, so
    * an `nBits` bucket prunes ~2^nBits while `nTables` independent
    * tables multiply recall. Candidates are verified with the exact
    * cosine, so precision is 1.0; recall for a pair at cosine c is
    * 1-(1-p^nBits)^nTables with p = 1-acos(c)/π.
    */
  def embeddingCosineLsh(emb: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, dim: Int, nTables: Int = 16,
                         nBits: Int = 8): DataFrame = {
    import graft.functions.VectorExpressions.dotF
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      Fns.l2Norm(col(vecCol)).as("nrm"))
    // repartition(t, b): the bucket table (nTables × nBits hyperplane
    // dots per vector) feeds both self-join sides; one exchange on
    // the join key shares the computation (the fan-out-recompute fix
    // proven on ngramJaccard/winnowPairs/overlapSpans).
    val tabled = emb.select(col(idCol).as("id"),
      explode(array((0 until nTables).map(t =>
        struct(lit(t).as("t"),
          Ann.lshBucket(col(vecCol), nBits, dim, planeOffset = t * nBits)
            .as("b"))): _*)).as("tb"))
      .select(col("id"), col("tb.t").as("t"), col("tb.b").as("b"))
      .repartition(col("t"), col("b"))
    val pairs = tabled.as("x")
      .join(tabled.as("y"),
        col("x.t") === col("y.t") && col("x.b") === col("y.b") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("doc_a"), col("y.id").as("doc_b")).distinct()
    roundedCosineAtLeast(pairs
        .join(base.toDF("doc_a", "va", "norm_a"), "doc_a")
        .join(base.toDF("doc_b", "vb", "norm_b"), "doc_b"),
        dotF(col("va"), col("vb")) / (col("norm_a") * col("norm_b")),
        threshold)
      .select("doc_a", "doc_b", "cosine")
  }

  /** Exact embedding dedup: one row per DISTINCT vector with the
    * canonical (minimum) id and the duplicate count — the embedding
    * analogue of [[exact]], and the stage that must run BEFORE any
    * embedding near-dup candidate scheme on corpora with heavy exact
    * replication. The two-point probe curve (docs/SCALE_NOTES.md,
    * round 7) shows why: identical replicas ALL collide in every LSH
    * bucket, so candidate pairs grow quadratically in the duplicate
    * multiplicity with no pruning possible — collapsing them to one
    * canonical first (a single shuffle) removes that blowup for every
    * downstream scheme. Groups by the vector VALUE itself (Spark
    * group-by array equality — no 64-bit-hash collision risk; NaN
    * and -0.0/0.0 normalize per Spark grouping semantics).
    */
  def embeddingExact(emb: DataFrame, idCol: String, vecCol: String)
  : DataFrame =
    emb.groupBy(col(vecCol).as(vecCol))
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_vecs"))

  /** SemDeDup-style embedding near-dup pairs: k-means cells block the
    * exact cosine compare, so the O(n²) work of [[embeddingCosine]]
    * drops to ~n²/nCells while each returned pair carries the TRUE
    * cosine (precision 1.0). This is the published scale path for
    * MODERATE thresholds (Abbas et al. 2023, "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication"), where
    * sign-LSH cannot prune (a hyperplane bit agrees with prob ~0.63 at
    * cosine 0.4 vs 0.5 background — see [[embeddingCosine]]'s note)
    * but cluster-blocking still can: semantically-near vectors
    * co-locate in k-means cells far more often than background pairs.
    *
    * Recall caveat, stated honestly: a qualifying pair SPLIT across
    * two cells is missed — the published tradeoff. nCells=1 reduces
    * exactly to [[embeddingCosine]]'s full pair set (spec-proven),
    * which is also the oracle baseline for measuring a corpus' recall
    * before committing to a cell count. The quantizer and corpus
    * assignment are shared with (and cached by) the IVF machinery —
    * a deployment that both searches and dedups the same table trains
    * k-means once.
    *
    * Scale shape: one k-means (sampled train + one corpus predict,
    * PERSISTED by the shared IVF cache — both self-join sides read
    * the cached assignment, so the prediction never recomputes,
    * unlike the uncached fan-out projections ngram/winnow had to
    * repartition for), per-cell TRIANGULAR-BLOCKED equi-join on the
    * composite (cell, block-pair) key — a hot cell's compares spread
    * over nBlocks²/2 buckets instead of serializing through one task
    * (AQE's skew split can never fix a SELF-join's hot key: both
    * sides share the hot partition — hotcell probe, round 12).
    */
  def embeddingSemdedup(emb: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, nCells: Int,
                        trainSample: Int = 100000,
                        nBlocks: Int = 16): DataFrame = {
    import graft.functions.VectorExpressions.dotF
    require(nBlocks >= 1)
    // nCells=1: no quantizer (KMeans needs k >= 2) — a constant cell
    // sends every pair through the same join/cosine path, which is
    // the exact-equivalence oracle mode
    val assigned =
      if (nCells <= 1)
        emb.select(col(idCol).as("id"), col(vecCol).as("v"),
          lit(0).as("cell"), Fns.l2Norm(col(vecCol)).as("nrm"))
      else Ann.cellIndex(emb, idCol, vecCol, nCells, trainSample).assigned
    // within-cell pairs via THE shared blocked self-pairing (a hot
    // cell is a self-join skew AQE cannot split — see
    // blockedSelfPairs)
    roundedCosineAtLeast(blockedSelfPairs(assigned, Seq("cell"), nBlocks),
        dotF(col("va"), col("vb")) / (col("nrm_a") * col("nrm_b")),
        threshold)
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"), col("cosine"))
  }

  /** The packaged embedding dedup KEEP LIST — the vector analogue of
    * the text [[pipeline]], with the same stage order and drop rule:
    * exact replica collapse first ([[embeddingExact]] — one linear
    * shuffle, removes the LSH/cell k² blowup), then near-dup pairs
    * among the CANONICALS ([[embeddingSemdedup]]), then keep-min — a
    * canonical drops if ANY smaller-id canonical pairs with it at or
    * above `threshold`. Returns the surviving ids (one per kept
    * content). nCells=1 makes the near-dup stage exact, which is the
    * oracle mode; at scale pick nCells ∝ corpus size.
    */
  def embeddingKeepList(emb: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, nCells: Int,
                        trainSample: Int = 100000): DataFrame = {
    val canon = embeddingExact(emb, idCol, vecCol)
      .select(col("canonical_id").as(idCol), col(vecCol))
      .localCheckpoint(false)
    val drops = embeddingSemdedup(canon, idCol, vecCol, threshold,
      nCells, trainSample)
      .select(col("doc_b").as(idCol)).distinct()
    canon.select(col(idCol)).join(broadcast(drops), Seq(idCol), "left_anti")
  }

  /** INCREMENTAL SemDeDup: dedup a batch of NEW vectors against the
    * vectors registered in a persisted IVF index
    * ([[Ann.ivfBuildIndex]]) without rescanning the corpus — the
    * embedding twin of [[dedupIncremental]], with the same first-seen
    * semantics and the same exactly-once `beforeRegister` hook.
    *
    * The index IS the dedup state. The frozen centroids give every
    * vector a stable cell, so incremental results are reproducible:
    * a new vector drops iff it has a same-cell partner at cosine >=
    * `threshold` that is either already registered or a smaller-id
    * batch sibling — exactly [[embeddingSemdedup]] over the union
    * UNDER THE INDEX'S ASSIGNMENT (spec-proven; a from-scratch batch
    * run would retrain k-means on the union and may cell vectors
    * differently). Recall carries SemDeDup's published cross-cell
    * caveat.
    *
    * Scale shape: the batch assigns against the broadcast centroid
    * table, reads ONLY its own cells' state files (the probed-cell
    * file pruning [[Ann.ivfServe]] uses — cell-sorted layout), joins
    * within cell, and registers every batch vector (drops included —
    * a dropped vector can still be a future vector's nearest partner
    * under keep-min semantics) via the keyed MERGE. A crashed batch
    * replays identically: partially-merged rows are excluded from the
    * state side by id, the recomputed survivors are the same frame,
    * and the MERGE re-registers idempotently.
    */
  def embeddingSemdedupIncremental(newEmb: DataFrame, idCol: String,
                                   vecCol: String, indexRoot: String,
                                   threshold: Double,
                                   beforeRegister: DataFrame => Unit =
                                     _ => (),
                                   nBlocks: Int = 16)
  : DataFrame = {
    import graft.functions.VectorExpressions.dotF
    import graft.offline.VersionedStore
    val spark = newEmb.sparkSession
    val centroidDf = VersionedStore
      .read(spark, Ann.centroidTable(indexRoot))
      .withColumn("cnrm", Fns.l2Norm(col("cv")))
    val assignedNew = Ann
      .assignToCentroids(newEmb, idCol, vecCol, centroidDf)
      .withColumn("nrm", Fns.l2Norm(col("v")))
      .localCheckpoint(false)
    // state side: only the batch's cells (bounded by nCentroids — a
    // small driver scalar), file-pruned via the cell-sorted layout;
    // exclude the batch's own ids so a crashed partial MERGE cannot
    // self-pair its rows on replay
    val cells = assignedNew.select("cell").distinct()
      .collect().map(_.getInt(0).toDouble).toSeq
    val state = VersionedStore
      .readValues(spark, Ann.assignmentTable(indexRoot), "cell", cells)
      .join(newEmb.select(col(idCol).as("id")), Seq("id"), "left_anti")
    def drops(cand: DataFrame): DataFrame =
      roundedCosineAtLeast(cand,
        dotF(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")),
        threshold)
      .select(col("b.id").as("id")).distinct()
    // batch self-pairs via THE shared blocked self-pairing (a hot
    // cell in the batch is a self-join skew AQE cannot split); the
    // larger id of each qualifying pair drops — the keep-min rule
    val dropNew = roundedCosineAtLeast(
        blockedSelfPairs(assignedNew, Seq("cell"), nBlocks),
        dotF(col("va"), col("vb")) / (col("nrm_a") * col("nrm_b")),
        threshold)
      .select(greatest(col("id_a"), col("id_b")).as("id")).distinct()
    // state × batch is a TWO-table join — one side duplicable, so
    // AQE's skew split genuinely applies here; left unblocked
    val dropOld = drops(state.as("a").join(assignedNew.as("b"),
      col("a.cell") === col("b.cell")))
    val survivors = assignedNew.select(col("id"))
      .join(broadcast(dropNew.unionByName(dropOld).distinct()),
        Seq("id"), "left_anti")
      .select(col("id").as(idCol))
    beforeRegister(survivors)
    VersionedStore.merge(assignedNew, Ann.assignmentTable(indexRoot),
      Seq("id"))
    survivors
  }
}
