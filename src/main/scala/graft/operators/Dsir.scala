package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023, arXiv:2302.03169): select raw-corpus documents whose
  * hashed-n-gram distribution resembles a target domain. The raw and
  * target corpora are summarized as bag-of-hashed-ngram unigram
  * models p_target / p_raw over `nBuckets` hash buckets; a document's
  * log importance weight is Σ_b c_b · (log p_target[b] − log p_raw[b])
  * over its own bucket counts c_b, and the selection step is Gumbel
  * top-k resampling on those weights (sampling without replacement
  * with probability ∝ the importance ratio).
  *
  * This is the domain-matching step of a pretraining curation
  * pipeline (the reference has nothing like it — its "selection" is
  * SQL predicates): score once against a small frozen target slice,
  * then keep the k docs the tilted distribution picks.
  *
  * Scale shape: the exploded gram stream aggregates straight to
  * (doc, bucket) counts with map-side combine; the two distribution
  * tables are ≤ nBuckets rows each and BROADCAST back, so the corpus
  * shuffles only twice (doc-bucket agg, per-doc weight agg) and the
  * final selection is a distributed top-k (TakeOrderedAndProject),
  * never a global sort. Nothing driver-side scales with corpus size.
  *
  * Determinism: the per-bucket log ratio is rounded to 6 dp and the
  * per-doc dot product is summed in exact decimal, so a document's
  * weight is a pure function of the corpus content — identical on any
  * partitioning or cluster size. The Gumbel noise is the seeded
  * md5-bucket family used by every sampler in this engine: a row's
  * key is a pure function of (seed, doc_id); a new seed draws a fresh
  * sample.
  */
object Dsir {

  /** Per-document hashed unigram+bigram counts: one row per
    * (doc_id, bucket) with the number of the document's grams landing
    * in that bucket (md5-based, portable hash). Documents with no
    * words yield no rows. `extraCols` are carried through the
    * aggregate (they must be functionally dependent on the doc id —
    * e.g. a target-membership flag).
    */
  def hashedNgramCounts(docs: DataFrame, idCol: String, textCol: String,
                        nBuckets: Int,
                        extraCols: Seq[(String, Column)] = Nil)
  : DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    // Single-pass codegen bucketing (HashedGramBuckets): identical
    // math to exploding `filter(split(text,' '), <> '')` unigrams +
    // concat_ws bigrams through Fns.md5Hash31 % nBuckets, but without
    // building per-gram strings or round-tripping md5 through hex
    // conv — the column pipeline was 12× slower at the bench.
    docs
      .select(col(idCol).as("doc_id") +:
        extraCols.map { case (n, c) => c.as(n) } :+
        explode(graft.functions.HashedGramScore.buckets(col(textCol),
          nBuckets)).as("bucket"): _*)
      .groupBy(("doc_id" +: extraCols.map(_._1) :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-document DSIR log importance weight against a target slice
    * of the SAME corpus (the common "match my curated subset" setup;
    * for an external target corpus, fit the bucket tables there and
    * join them in by hand — the math is identical).
    *
    * Returns (doc_id, n_grams, dsir_weight) for every document with
    * at least one word — target rows included, so callers can sanity-
    * check that the target slice itself scores high. `alpha` is the
    * add-α smoothing applied to both models; buckets the corpus never
    * hits contribute nothing to any document and are skipped (their
    * smoothed mass only enters through the totals' +α·nBuckets term,
    * which IS applied).
    */
  /** (bucket, c, t) model counts from a per-doc count frame — the
    * ADDITIVE summary the persisted store refreshes by keyed MERGE. */
  private def bucketCounts(f: DataFrame): DataFrame =
    f.groupBy("bucket").agg(sum("cnt").as("c"),
      sum(when(col("is_target"), col("cnt")).otherwise(lit(0L))).as("t"))

  /** Per-bucket 6dp-rounded log ratio from (bucket, c, t) counts —
    * the one place the model arithmetic lives, shared by the inline,
    * frozen and persisted paths so they can never diverge. */
  private def lrFromCounts(counts: DataFrame, nBuckets: Int,
                           alpha: Double): DataFrame = {
    val totals = counts.agg(sum("c").as("raw_total"),
      sum("t").as("tgt_total"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(
          log((col("t") + alpha) / (col("tgt_total") + alpha * nBuckets)) -
          log((col("c") + alpha) / (col("raw_total") + alpha * nBuckets)),
          6).cast("decimal(20,6)").as("lr"))
  }

  /** The shared estimation pass: per-doc bucket counts (checkpointed —
    * they feed the model aggregation AND the weight join) and the
    * per-bucket 6dp-rounded log ratio table (≤ nBuckets rows). */
  private def countsAndRatios(docs: DataFrame, idCol: String,
                              textCol: String, isTarget: Column,
                              nBuckets: Int, alpha: Double)
  : (DataFrame, DataFrame) = {
    require(alpha > 0, "alpha must be positive (zero-count buckets)")
    val f = hashedNgramCounts(docs, idCol, textCol, nBuckets,
        Seq("is_target" -> isTarget))
      .localCheckpoint(false)
    (f, lrFromCounts(bucketCounts(f), nBuckets, alpha))
  }

  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, nBuckets: Int = 10000,
                        alpha: Double = 1.0): DataFrame = {
    val (f, lr) = countsAndRatios(docs, idCol, textCol, isTarget,
      nBuckets, alpha)
    // The dot product accumulates in exact integer MICROS, not
    // decimal: lr is an exact 6dp decimal, so lr·1e6 is an exact
    // long (derived once on the ≤ nBuckets-row model table), and
    // Σ cnt·lr_micros is the exact decimal sum scaled by 1e6 — but
    // the per-(doc, bucket)-row aggregate update is a codegen long
    // add instead of a precision-33 BigDecimal add (the round-15
    // retrieval-ranker lesson; [[scoreFrozen]] already computes this
    // exact shape, which is why the two stay bit-equal). The final
    // long→double/1e6 equals the decimal cast whenever the micro sum
    // is under 2^53 (|weight| ≤ 9e9 — the engine-wide 2^53 contract).
    val lrm = lr.withColumn("lrm",
      (col("lr") * lit(1000000L)).cast("long"))
    f.join(broadcast(lrm), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_grams"),
        (sum(col("cnt") * col("lrm")).cast("double") / 1e6)
          .as("dsir_weight"))
  }

  /** A frozen DSIR model: the per-bucket log ratios in exact 1e-6
    * units — ≤ nBuckets entries, the offline artifact a stream scores
    * against (the CCNet-vocabulary shape). */
  case class DsirModel(nBuckets: Int, micros: Map[Long, Long])

  /** Fit the model once, offline: collect the log-ratio table to the
    * driver (≤ nBuckets rows — bucket-bounded, never corpus-bounded)
    * as exact micro units. */
  def freezeModel(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, nBuckets: Int = 10000,
                  alpha: Double = 1.0): DsirModel = {
    val (_, lr) = countsAndRatios(docs, idCol, textCol, isTarget,
      nBuckets, alpha)
    DsirModel(nBuckets, lr.collect().map(r =>
      r.getLong(0) -> r.getDecimal(1).movePointRight(6).longValueExact)
      .toMap)
  }

  // --- persisted model store (incremental refresh) -------------------

  private[operators] def countsTable(root: String) = s"$root/counts"
  private[operators] def paramsTable(root: String) = s"$root/params"
  private[operators] def appliedTable(root: String) = s"$root/applied"

  /** Build and PERSIST the DSIR count model as VersionedStore tables
    * under `root`: `counts` (bucket, c, t — corpus and target gram
    * counts, laid out in disjoint bucket ranges so a refresh MERGE
    * prunes files), `params` (nBuckets, alpha) and `applied` (the
    * shard ledger). Counts are ADDITIVE, so the store refreshes
    * shard-at-a-time ([[upsertModelCounts]]) without ever rescanning
    * the corpus — the model-maintenance shape of the persisted IVF
    * index, for the distribution-estimation half of DSIR.
    */
  def buildModelStore(docs: DataFrame, idCol: String, textCol: String,
                      isTarget: Column, root: String,
                      nBuckets: Int = 10000, alpha: Double = 1.0): Unit = {
    import graft.offline.VersionedStore
    require(alpha > 0, "alpha must be positive (zero-count buckets)")
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = bucketCounts(hashedNgramCounts(docs, idCol, textCol,
      nBuckets, Seq("is_target" -> isTarget)))
    VersionedStore.overwrite(
      counts.repartitionByRange(math.max(1, nBuckets / 4096),
        col("bucket")).sortWithinPartitions("bucket"),
      countsTable(root))
    VersionedStore.overwrite(
      Seq((nBuckets.toLong, alpha)).toDF("n_buckets", "alpha"),
      paramsTable(root))
    VersionedStore.overwrite(
      Seq("__init__").toDF("shard_id"), appliedTable(root))
  }

  private def readParams(spark: org.apache.spark.sql.SparkSession,
                         root: String): (Int, Double) = {
    val r = graft.offline.VersionedStore
      .read(spark, paramsTable(root)).head()
    (r.getLong(0).toInt, r.getDouble(1))
  }

  /** Fold ONE new shard's gram counts into the stored model: a keyed
    * MERGE on `bucket` that rewrites only the files whose bucket
    * ranges the shard touches, EXACTLY-once under the engine-wide
    * intent/done protocol ([[graft.offline.Ledger.ingestOnce]]): a
    * replayed ingest no-ops by the ledger, and a crash BETWEEN the
    * counts commit and the ledger row — the window that used to
    * re-apply the shard — is now recovered by comparing the store's
    * total mass against the intent row. Target membership of new
    * docs comes from `isTarget` exactly as at build time.
    */
  def upsertModelCounts(shardDocs: DataFrame, idCol: String,
                        textCol: String, isTarget: Column,
                        root: String, shardId: String): Boolean = {
    import graft.offline.Ledger
    val spark = shardDocs.sparkSession
    Ledger.requireFrameFree(shardId)
    if (Ledger.isApplied(spark, appliedTable(root), shardId))
      return false
    val (nBuckets, _) = readParams(spark, root)
    // EXACTLY-once under the engine-wide intent/done ingest protocol:
    // the importance weights derive from these counts as exact
    // integers, so the classic crash-window double count would
    // silently tilt every log-ratio. Evidence mass = c + t.
    Ledger.ingestOnce(spark, appliedTable(root), countsTable(root),
      Seq("bucket"), Seq("c", "t"),
      bucketCounts(hashedNgramCounts(shardDocs, idCol, textCol,
        nBuckets, Seq("is_target" -> isTarget))),
      shardId)
  }

  /** Retract one previously-ingested shard from the count model —
    * the right-to-be-forgotten path every additive count store
    * carries ([[graft.offline.Ledger.retractOnce]]'s intent/done
    * crash protocol): c and t subtract exactly, exhausted buckets are
    * deleted, and a model frozen afterwards equals one that never saw
    * the shard. Membership of the shard's docs comes from `isTarget`
    * exactly as at ingest time — retraction must mirror the ingest's
    * own accounting. */
  def retractModelCounts(shardDocs: DataFrame, idCol: String,
                         textCol: String, isTarget: Column,
                         root: String, shardId: String): Boolean = {
    import graft.offline.Ledger
    val spark = shardDocs.sparkSession
    val (nBuckets, _) = readParams(spark, root)
    Ledger.retractOnce(spark, appliedTable(root), countsTable(root),
      Seq("bucket"), Seq("c", "t"),
      bucketCounts(hashedNgramCounts(shardDocs, idCol, textCol,
        nBuckets, Seq("is_target" -> isTarget))),
      shardId)
  }

  /** Freeze the scoring artifact straight from the persisted counts —
    * no corpus scan. Bit-equal to [[freezeModel]] over the union of
    * every ingested shard: counts are exact longs, and the log-ratio
    * arithmetic is the same shared code path.
    */
  def freezeFromStore(spark: org.apache.spark.sql.SparkSession,
                      root: String): DsirModel = {
    val (nBuckets, alpha) = readParams(spark, root)
    // c > 0 OR t > 0: a full-retraction crash residue row (deleteKeys
    // cannot empty a table) is NOT a bucket the corpus ever produced
    val lr = lrFromCounts(
      graft.offline.VersionedStore.read(spark, countsTable(root))
        .filter(col("c") > 0 || col("t") > 0),
      nBuckets, alpha)
    DsirModel(nBuckets, lr.collect().map(r =>
      r.getLong(0) -> r.getDecimal(1).movePointRight(6).longValueExact)
      .toMap)
  }

  /** STREAMING-SAFE DSIR scoring against a [[freezeModel]] artifact:
    * one codegen projection per document (no explode, no join, no
    * shuffle — [[graft.functions.HashedGramScore]] hashes every
    * unigram+bigram and sums the frozen micro log-ratios in exact
    * integer arithmetic). When the model froze from the scored corpus
    * itself, the output is BIT-EQUAL to [[importanceWeights]]: the
    * integer micro sum divided by 1e6 is the same correctly-rounded
    * double as the batch path's exact-decimal dot product cast. On
    * NEW documents, grams whose bucket the frozen corpus never
    * produced contribute zero (an unseen gram is neutral) but still
    * count toward n_grams — the deliberate frozen-policy semantics.
    */
  def scoreFrozen(docs: DataFrame, idCol: String, textCol: String,
                  model: DsirModel): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        graft.functions.HashedGramScore.score(col(textCol),
          model.nBuckets, model.micros).as("sc"))
      .filter(col("sc.n_grams") > 0)
      .select(col("doc_id"), col("sc.n_grams").as("n_grams"),
        (col("sc.score_micros") / lit(1000000L)).as("dsir_weight"))

  /** Gumbel top-k resampling over [[importanceWeights]] output: adds
    * a seeded Gumbel perturbation to each log weight and keeps the k
    * largest keys — exactly sampling k documents without replacement
    * with probability proportional to exp(dsir_weight) (Vieira 2014's
    * Gumbel-max trick, the sampler the DSIR paper prescribes).
    * Deterministic: the noise is a pure function of (seed, doc_id).
    * Distributed top-k (orderBy+limit = TakeOrderedAndProject) — no
    * global sort, no driver collection beyond the k result rows.
    */
  def resample(weights: DataFrame, k: Int, seed: String = "graft")
  : DataFrame = {
    require(k > 0, "k must be positive")
    val u = (Fns.md5Hash31(concat(lit(seed), lit(":"),
      col("doc_id").cast("string"))) + 0.5) / 2147483648.0
    weights
      .withColumn("gumbel_key",
        round(col("dsir_weight") - log(-log(u)), 6))
      .orderBy(col("gumbel_key").desc, col("doc_id"))
      .limit(k)
  }
}
