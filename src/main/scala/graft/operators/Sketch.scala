package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Fns, HllSketch}

/** Mergeable-sketch operators — the statistics a 100 TB corpus can
  * only afford approximately, each held to an EXACT cross-engine
  * oracle by deriving every hash from the engine's portable md5
  * family (so the sketch contents are deterministic; only their
  * error vs ground truth is probabilistic, and the queries surface
  * that error as an audited column).
  *
  * Three families:
  *   - HyperLogLog distinct counts ([[hllDistinct]] — the in-plan
  *     oracle twin of [[graft.functions.HllSketch]]'s one-pass
  *     aggregate),
  *   - KMV (bottom-k) slice-overlap / Jaccard estimation
  *     ([[kmvOverlap]] — "how much do two corpus slices share"
  *     without an all-pairs or full-join pass),
  *   - Bloom-filter membership ([[bloomMembership]] — a takedown /
  *     drop list compiled to a few-KB bitset that BROADCASTS where
  *     the list itself would shuffle, false positives audited).
  *
  * Reference parity: the reference computes only exact statistics
  * (FeatureStatisticsService); sketches are this engine's beyond-
  * parity scale surface, same family as SQ8/PQ on the vector side.
  */
object Sketch {

  // ---------------------------------------------------------------
  // HyperLogLog
  // ---------------------------------------------------------------

  /** h1/h2: the first/second 8 md5 hex chars of the key as 32-bit
    * unsigned values — the same split the SQL oracle replays with
    * `('0x' || substr(md5(k), 1, 8))::BIGINT`.
    */
  private def h32(key: Column, off: Int): Column =
    conv(substring(md5(key), off, 8), 16, 10).cast("long")

  /** rho = leading-zero count of the 32-bit h2 + 1, via the binary
    * string both engines agree on: bin() never left-pads, so
    * 33 - length(ltrim(bin(h2),'0')) is exact, and h2 = 0 (empty
    * string after the trim) lands on the 33 cap with no special case.
    */
  private def rho32(h2: Column): Column =
    lit(33) - length(ltrim(bin(h2), "0"))

  /** Distinct-count estimate per group via an IN-PLAN HyperLogLog:
    * register maxima as a (group, register) aggregate, then the
    * harmonic estimator with linear-counting correction. This is the
    * oracle-replayable twin of the one-pass
    * [[graft.functions.HllSketch]] aggregate (spec-proven equal);
    * the register shuffle is groups × 2^p rows — negligible — and
    * both shuffles are map-side combinable.
    *
    * Output: group cols, n_exact (audit), hll_estimate, rel_err.
    * The estimate rounds to 4dp (ln/alpha arithmetic is libm-
    * adjacent); the register SUM itself is exact in IEEE double —
    * every term is a power of two ≥ 2^-33 and the total stays under
    * 2^13, inside the 52-bit mantissa, so summation order cannot
    * change it.
    */
  def hllDistinct(df: DataFrame, keyCol: String, groupCols: Seq[String],
                  p: Int = HllSketch.DefaultP): DataFrame = {
    require(p >= 4 && p <= 16)
    require(groupCols.nonEmpty, "hllDistinct needs at least one group column")
    val m = 1 << p
    val g = groupCols.map(col)
    val key = col(keyCol)
    // Null keys carry no information and would otherwise propagate a
    // null register index; drop them (the one-pass aggregate's update
    // skips nulls — the twins must agree).
    val regs = df.filter(key.isNotNull)
      .select(g :+ (h32(key, 1) % m).as("reg_idx") :+
        rho32(h32(key, 9)).as("rho"): _*)
      .groupBy(g :+ col("reg_idx"): _*)
      .agg(max("rho").as("mj"))
    val est = regs
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_regs"),
        sum(pow(lit(2.0), -col("mj"))).as("sum_present"))
      .withColumn("zeros", lit(m) - col("n_regs"))
      .withColumn("raw_e",
        lit(HllSketch.alpha(m)) * lit(m.toDouble) * lit(m.toDouble) /
          (col("sum_present") + col("zeros").cast("double")))
      .withColumn("hll_estimate",
        round(when(col("raw_e") <= lit(2.5 * m) && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
          .otherwise(col("raw_e")), 4))
    val exact = df.groupBy(g: _*)
      .agg(countDistinct(key).as("n_exact"))
    est.join(exact, groupCols)
      .select(g :+ col("n_exact") :+ col("hll_estimate") :+
        round((col("hll_estimate") - col("n_exact")) / col("n_exact"), 4)
          .as("rel_err"): _*)
  }

  /** The one-pass sketch table: one (group, sketch) row per group via
    * the [[graft.functions.HllSketch]] aggregate — THIS is the shape
    * that persists: write it per (shard × slice), and any later
    * distinct-count over any slice union is [[mergeEstimate]] over
    * the sketch table, never a corpus rescan.
    */
  def hllSketchTable(df: DataFrame, keyCol: String, groupCols: Seq[String],
                     p: Int = HllSketch.DefaultP): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(HllSketch.sketch(col(keyCol), p).as("sketch"))

  /** Merge persisted sketches (any regrouping) and estimate. */
  def mergeEstimate(sketches: DataFrame, groupCols: Seq[String],
                    sketchCol: String = "sketch"): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(HllSketch.merge(col(sketchCol)).as("sketch"))
      .withColumn("hll_estimate",
        round(HllSketch.estimateCol(col("sketch")), 4))
      .drop("sketch")

  // ---------------------------------------------------------------
  // Persisted sketch store (the incremental / streaming shape)
  // ---------------------------------------------------------------

  private def sketchTable(root: String) = s"$root/hll_sketches"
  private def sketchParamsTable(root: String) = s"$root/hll_params"
  private def sketchAppliedTable(root: String) = s"$root/hll_applied"

  /** Initialize the persisted sketch store: one (group, sketch) row
    * per group as a VersionedStore table plus the shard ledger. From
    * here, distinct-count maintenance is [[upsertSketches]] per
    * arriving shard — the corpus is never rescanned — and ANY
    * later slice query is [[readDistinct]] over the sketch table.
    */
  def buildSketchStore(df: DataFrame, keyCol: String, groupCols: Seq[String],
                       root: String, p: Int = HllSketch.DefaultP): Unit = {
    import graft.offline.VersionedStore
    val spark = df.sparkSession
    import spark.implicits._
    VersionedStore.overwrite(
      hllSketchTable(df, keyCol, groupCols, p), sketchTable(root))
    // p freezes at build time (the kmv_params/cm_params contract): an
    // upsert sketching at a different p would insert register arrays
    // of the wrong size for groups new to the store, and the later
    // cross-group merge would throw AFTER the store is polluted.
    VersionedStore.overwrite(Seq(p.toLong).toDF("p"),
      sketchParamsTable(root))
    VersionedStore.overwrite(
      Seq("__init__").toDF("shard_id"), sketchAppliedTable(root))
  }

  /** Fold one shard's keys into the persisted sketches: a keyed MERGE
    * on the group columns after a register-max union with the current
    * rows. Register max is idempotent, so even a replayed shard
    * cannot corrupt the sketch — the ledger exists to make replays
    * cheap no-ops and to audit what has been folded (the
    * at-least-once-with-dedup contract of the other persisted
    * artifacts, with idempotence as a second safety net the additive
    * stores don't have). Returns whether the shard was applied.
    */
  def upsertSketches(shardDf: DataFrame, keyCol: String,
                     groupCols: Seq[String], root: String,
                     shardId: String): Boolean = {
    import graft.offline.VersionedStore
    val spark = shardDf.sparkSession
    import spark.implicits._
    requireUnreservedNiShardId(shardId)
    val applied = VersionedStore.read(spark, sketchAppliedTable(root))
      .filter(col("shard_id") === shardId).limit(1).count() > 0
    if (applied) return false
    // p is a store property, read back from build time — a per-call p
    // could insert wrong-size register arrays for new groups. A store
    // written before p froze has no params table: fail with the
    // migration story, not the generic no-committed-version require.
    val p =
      try VersionedStore.read(spark, sketchParamsTable(root))
        .select("p").head().getLong(0).toInt
      catch {
        case e: IllegalArgumentException =>
          throw new IllegalStateException(
            s"HLL store at $root predates the frozen-p params table " +
              s"(${sketchParamsTable(root)} is missing or empty): " +
              "rebuild it with buildSketchStore/rebuildSketchStore, " +
              "or backfill the params table with the p it was built at",
            e)
      }
    val shard = hllSketchTable(shardDf, keyCol, groupCols, p)
    // Only the groups this shard touches: the keyed MERGE then
    // rewrites only the files whose group ranges the shard hits.
    val cur = VersionedStore.read(spark, sketchTable(root))
      .join(shard.select(groupCols.map(col): _*).distinct(),
        groupCols, "left_semi")
    val combined = shard.union(cur.select(shard.columns.map(col): _*))
      .groupBy(groupCols.map(col): _*)
      .agg(HllSketch.merge(col("sketch")).as("sketch"))
    VersionedStore.merge(combined, sketchTable(root), groupCols)
    VersionedStore.append(Seq(shardId).toDF("shard_id"),
      sketchAppliedTable(root))
    true
  }

  /** Distinct-count estimates from the persisted store, re-grouped to
    * any SUBSET of the stored group columns (sketch union across the
    * collapsed dimensions — the query that makes the store worth
    * keeping: per-slice, per-shard-group, or global cardinalities
    * from kilobytes of registers, zero corpus IO).
    */
  def readDistinct(spark: org.apache.spark.sql.SparkSession, root: String,
                   groupCols: Seq[String]): DataFrame = {
    import graft.offline.VersionedStore
    val stored = VersionedStore.read(spark, sketchTable(root))
    // Serve-time takedown suppression: a registered group's registers
    // never reach the merge, even when the read regroups — suppression
    // happens at STORED granularity, where state is separable.
    val live = pendingTakedown(spark, root, "hll") match {
      case Some(td) =>
        val idCols = stored.columns.toSeq.filterNot(_ == "sketch")
        suppressRows(stored, tdKeyExpr(idCols.map(stored(_))), td)
      case None => stored
    }
    mergeEstimate(live, groupCols)
  }

  // ---------------------------------------------------------------
  // Persisted KMV sketches (overlap queries from the store)
  // ---------------------------------------------------------------

  private def kmvTable(root: String) = s"$root/kmv_sketches"
  private def kmvParamsTable(root: String) = s"$root/kmv_params"
  private def kmvAppliedTable(root: String) = s"$root/kmv_applied"

  private def kmvK(spark: org.apache.spark.sql.SparkSession,
                   root: String): Int = {
    import graft.offline.VersionedStore
    VersionedStore.read(spark, kmvParamsTable(root))
      .select("k").head().getLong(0).toInt
  }

  /** Bottom-k md5 values per slice as rows (slice, h) — the KMV
    * sketch in storable form. KMV is mergeable exactly like HLL:
    * bottom-k of a union is the bottom-k of the concatenated
    * sketches, and the merge is idempotent — so the same
    * shard-ledger store pattern applies.
    */
  def kmvSketchRows(df: DataFrame, keyCol: String, sliceCol: String,
                    k: Int): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .select(col(sliceCol).as("slice"), md5(col(keyCol)).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("slice").orderBy("h")))
      .filter(col("rn") <= k)
      .select("slice", "h")

  /** Initialize the persisted KMV store (pairs with
    * [[buildSketchStore]]'s HLL table: together the two sketch
    * families answer "how many distinct" and "how much shared"
    * for any slice from kilobytes, no corpus rescan). */
  def buildKmvStore(df: DataFrame, keyCol: String, sliceCol: String,
                    root: String, k: Int = 64): Unit = {
    import graft.offline.VersionedStore
    val spark = df.sparkSession
    import spark.implicits._
    VersionedStore.overwrite(
      kmvSketchRows(df, keyCol, sliceCol, k), kmvTable(root))
    // k is a STORE property, not a call-site one: an upsert trimming
    // to a smaller k would silently discard stored sample rows, a
    // larger one would leave slices inconsistently sized — so k
    // freezes at build time and every later fold reads it back
    // (the cm_params contract)
    VersionedStore.overwrite(Seq(k.toLong).toDF("k"), kmvParamsTable(root))
    VersionedStore.overwrite(
      Seq("__init__").toDF("shard_id"), kmvAppliedTable(root))
  }

  /** Fold one shard into the KMV store: per touched slice, re-trim
    * the union of stored and shard sketch rows to the k smallest —
    * exactly the bottom-k of the union of underlying key sets
    * (values below the kept threshold are never displaced by later
    * arrivals, so folding is order-independent and idempotent).
    */
  def upsertKmv(shardDf: DataFrame, keyCol: String, sliceCol: String,
                root: String, shardId: String): Boolean = {
    import graft.offline.VersionedStore
    val spark = shardDf.sparkSession
    import spark.implicits._
    requireUnreservedNiShardId(shardId)
    val applied = VersionedStore.read(spark, kmvAppliedTable(root))
      .filter(col("shard_id") === shardId).limit(1).count() > 0
    if (applied) return false
    val k = kmvK(spark, root)
    val shard = kmvSketchRows(shardDf, keyCol, sliceCol, k)
    val cur = VersionedStore.read(spark, kmvTable(root))
      .join(shard.select("slice").distinct(), Seq("slice"), "left_semi")
    val combined = shard.union(cur.select("slice", "h")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("slice").orderBy("h")))
      .filter(col("rn") <= k)
      .select("slice", "h")
    VersionedStore.merge(combined, kmvTable(root), Seq("slice"))
    VersionedStore.append(Seq(shardId).toDF("shard_id"),
      kmvAppliedTable(root))
    true
  }

  /** Pairwise Jaccard estimates for ALL slice pairs straight from the
    * persisted KMV sketches — slices × k rows in, pairs out, the
    * corpus never read. Same estimator as [[kmvOverlap]]'s
    * `audit = false` path.
    */
  def readOverlap(spark: org.apache.spark.sql.SparkSession,
                  root: String): DataFrame = {
    import graft.offline.VersionedStore
    val stored = VersionedStore.read(spark, kmvTable(root))
    // takedown suppression at slice granularity (see registerTakedown)
    val live = pendingTakedown(spark, root, "kmv") match {
      case Some(td) => suppressRows(stored, col("slice").cast("string"), td)
      case None => stored
    }
    val sk = live.select("slice", "h").localCheckpoint(false)
    overlapFromSketches(sk, kmvK(spark, root))
  }

  /** The estimator over sketch rows (shared by [[kmvOverlap]] and
    * [[readOverlap]]). */
  private def overlapFromSketches(sk: DataFrame, k: Int): DataFrame = {
    val slices = sk.select("slice").distinct()
    val pairFrame = slices.as("a").join(slices.as("b"),
        col("a.slice") < col("b.slice"), "inner")
      .select(col("a.slice").as("slice_a"), col("b.slice").as("slice_b"))
    val unioned = pairFrame
      .join(sk.select(col("slice").as("slice_a"), col("h")), Seq("slice_a"))
      .select("slice_a", "slice_b", "h")
      .union(pairFrame
        .join(sk.select(col("slice").as("slice_b"), col("h")), Seq("slice_b"))
        .select("slice_a", "slice_b", "h"))
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("slice_a", "slice_b").orderBy("h")))
      .filter(col("rn") <= k)
    val inA = sk.select(col("slice").as("slice_a"), col("h"))
    val inB = sk.select(col("slice").as("slice_b"), col("h"))
    val est = unioned
      .join(inA, Seq("slice_a", "h"), "left_semi")
      .join(inB, Seq("slice_b", "h"), "left_semi")
      .groupBy("slice_a", "slice_b").agg(count(lit(1)).as("n_both"))
    unioned.groupBy("slice_a", "slice_b")
      .agg(count(lit(1)).as("n_union_sk"))
      .join(est, Seq("slice_a", "slice_b"), "left")
      .na.fill(0L, Seq("n_both"))
      .select(col("slice_a"), col("slice_b"),
        round(col("n_both").cast("double") / col("n_union_sk"), 6)
          .as("jaccard_est"))
  }

  // ---------------------------------------------------------------
  // KMV (bottom-k) slice overlap
  // ---------------------------------------------------------------

  /** Pairwise slice-overlap estimation via K-minimum-values sketches:
    * each slice keeps its k lexicographically-smallest md5(key)
    * values (a uniform sample of the key space — md5 hex orders
    * identically in Spark and DuckDB); for a pair, the k smallest of
    * the sketch UNION is a KMV sketch of the union, and the fraction
    * of those present in BOTH slices' sketches estimates Jaccard
    * (Beyer et al. 2007). Exact Jaccard rides along as the audit.
    *
    * Scale shape: one distinct + one windowed bottom-k per slice
    * (k rows/slice survive), then all work happens on sketches —
    * slices × k rows total. The corpus itself is never pair-joined;
    * estimating overlap of every pair of 1000 shards of a 100 TB
    * corpus touches each row once. The exact-audit join is the only
    * corpus-sized pair work and exists for the oracle; production
    * callers pass `audit = false` and get the estimate alone (the
    * corpus-sized self-join never builds).
    */
  def kmvOverlap(df: DataFrame, keyCol: String, sliceCol: String,
                 k: Int = 64, audit: Boolean = true): DataFrame = {
    // Lazy checkpoints kill the rescan trap: `sk` feeds five subtrees
    // (slices, two union legs, two semi-joins) and `keys` three more
    // on the audit path — without them the corpus-sized distinct
    // would recompute per subtree (the 12x-rescan lesson).
    val keys0 = df.filter(col(keyCol).isNotNull)
      .select(col(sliceCol).as("slice"),
        md5(col(keyCol)).as("h")).distinct()
    val keys = if (audit) keys0.localCheckpoint(false) else keys0
    val sk = keys
      .withColumn("rn", row_number().over(
        Window.partitionBy("slice").orderBy("h")))
      .filter(col("rn") <= k)
      .select("slice", "h")
      .localCheckpoint(false)
    val estimated = overlapFromSketches(sk, k)
    if (!audit) return estimated
    // Exact audit (distinct keys per slice are already materialized).
    val exact = keys.as("x").join(keys.as("y"),
        col("x.h") === col("y.h") && col("x.slice") < col("y.slice"))
      .groupBy(col("x.slice").as("slice_a"), col("y.slice").as("slice_b"))
      .agg(count(lit(1)).as("n_inter"))
    val sizes = keys.groupBy(col("slice")).agg(count(lit(1)).as("n"))
    estimated
      .join(sizes.select(col("slice").as("slice_a"), col("n").as("n_a")), "slice_a")
      .join(sizes.select(col("slice").as("slice_b"), col("n").as("n_b")), "slice_b")
      .join(exact, Seq("slice_a", "slice_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .select(col("slice_a"), col("slice_b"), col("jaccard_est"),
        round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")), 6).as("jaccard_exact"),
        col("n_inter").as("n_inter_exact"))
  }

  // ---------------------------------------------------------------
  // Quantile sketch (deterministic uniform sample by hash)
  // ---------------------------------------------------------------

  /** Approximate per-group quantiles from a DETERMINISTIC uniform
    * sample: keep each group's k rows with the smallest md5(id) (ids
    * are unique, md5 is uniform → a uniform without-replacement
    * sample that is REPRODUCIBLE and, like KMV, mergeable — the
    * bottom-k of a union is the bottom-k of the parts, so per-shard
    * samples fold with a re-trim). Quantile q = the sample's value
    * at sorted index floor(q·(n-1)) (ties broken by the hash, so
    * selection is total-order deterministic); the exact quantile
    * under the SAME discrete definition over the full data rides
    * along as the audit.
    *
    * This is the third leg of the sketch store ("how many distinct" /
    * "how much shared" / "how distributed") — and unlike
    * percentile_approx's opaque internal state, the sample IS rows,
    * so it persists, merges, and replays in the SQL oracle.
    * Sample error: standard order-statistics bounds (~1/sqrt(k)
    * quantile deviation); k=256 → ~±6% rank error at 95% conf.
    */
  def quantileSketch(df: DataFrame, valueCol: String, idCol: String,
                     groupCols: Seq[String], k: Int = 256,
                     qs: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    require(groupCols.nonEmpty && qs.nonEmpty)
    val g = groupCols.map(col)
    val keyed = df
      .filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(g :+ col(valueCol).as("v") :+
        md5(col(idCol).cast("string")).as("h"): _*)
    val sample = keyed
      .withColumn("srn", row_number().over(
        Window.partitionBy(g: _*).orderBy(col("h"))))
      .filter(col("srn") <= k)
      .drop("srn")
    pickQuantiles(sample, g, qs, "sample")
      .join(pickQuantiles(keyed, g, qs, "exact"), groupCols)
  }

  /** Discrete quantiles over a (group cols, v, h) frame: value at
    * sorted index floor(q·(n-1)), ties broken by the hash — shared by
    * [[quantileSketch]]'s sample/exact halves and [[readQuantiles]].
    */
  private def pickQuantiles(src: DataFrame, g: Seq[Column],
                            qs: Seq[Double], prefix: String): DataFrame = {
    val ranked = src
      .withColumn("vr", row_number().over(
        Window.partitionBy(g: _*).orderBy(col("v"), col("h"))))
      .withColumn("ns", count(lit(1)).over(Window.partitionBy(g: _*)))
    val aggs = max(col("ns")).as(s"n_$prefix") +:
      qs.map { q =>
        max(when(col("vr") === floor(lit(q) * (col("ns") - 1)) + 1,
          col("v"))).as(s"p${(q * 100).round}_$prefix")
      }
    ranked.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
  }

  // ---------------------------------------------------------------
  // Persisted quantile samples (the third sketch store)
  // ---------------------------------------------------------------

  private def qsTable(root: String) = s"$root/quantile_sample"
  private def qsParamsTable(root: String) = s"$root/quantile_params"
  private def qsAppliedTable(root: String) = s"$root/quantile_applied"

  /** The storable form of [[quantileSketch]]'s sample: per slice, the
    * k rows with the smallest md5(id) as (slice, v, h) rows. Bottom-k
    * by hash is mergeable exactly like KMV — the bottom-k of a union
    * is the bottom-k of the concatenated parts — so the same
    * shard-ledger store pattern applies, and the sample stays a
    * uniform without-replacement draw over the distinct ids ever
    * ingested (assuming ids are unique across shards, the corpus
    * contract; a replayed id dedups by the (slice, v, h) distinct).
    */
  def quantileSampleRows(df: DataFrame, valueCol: String, idCol: String,
                         sliceCol: String, k: Int): DataFrame =
    df.filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(sliceCol).as("slice"), col(valueCol).as("v"),
        md5(col(idCol).cast("string")).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("slice").orderBy("h", "v")))
      .filter(col("rn") <= k)
      .select("slice", "v", "h")

  /** Initialize the persisted quantile-sample store — the third leg
    * of the sketch store family ("how distributed", beside HLL's
    * "how many distinct" and KMV's "how much shared"): k sample rows
    * per slice in a VersionedStore table plus the shard ledger. From
    * here distribution maintenance is [[upsertQuantileSample]] per
    * arriving shard, and any later quantile read is [[readQuantiles]]
    * over slices × k stored rows — zero corpus IO.
    */
  def buildQuantileStore(df: DataFrame, valueCol: String, idCol: String,
                         sliceCol: String, root: String,
                         k: Int = 256): Unit = {
    import graft.offline.VersionedStore
    val spark = df.sparkSession
    import spark.implicits._
    VersionedStore.overwrite(
      quantileSampleRows(df, valueCol, idCol, sliceCol, k), qsTable(root))
    // k freezes at build time (the cm_params contract) — an upsert
    // re-trimming to a caller-supplied smaller k would silently
    // discard stored sample rows
    VersionedStore.overwrite(Seq(k.toLong).toDF("k"), qsParamsTable(root))
    VersionedStore.overwrite(
      Seq("__init__").toDF("shard_id"), qsAppliedTable(root))
  }

  /** Fold one shard into the quantile store: union stored and shard
    * sample rows, re-trim to the k smallest hashes per touched slice
    * — order-independent and idempotent (the KMV argument: a value
    * below the kept threshold is never displaced by later arrivals).
    */
  def upsertQuantileSample(shardDf: DataFrame, valueCol: String,
                           idCol: String, sliceCol: String, root: String,
                           shardId: String): Boolean = {
    import graft.offline.VersionedStore
    val spark = shardDf.sparkSession
    import spark.implicits._
    requireUnreservedNiShardId(shardId)
    val applied = VersionedStore.read(spark, qsAppliedTable(root))
      .filter(col("shard_id") === shardId).limit(1).count() > 0
    if (applied) return false
    val k = VersionedStore.read(spark, qsParamsTable(root))
      .select("k").head().getLong(0).toInt
    val shard = quantileSampleRows(shardDf, valueCol, idCol, sliceCol, k)
    val cur = VersionedStore.read(spark, qsTable(root))
      .join(shard.select("slice").distinct(), Seq("slice"), "left_semi")
    val combined = shard.union(cur.select("slice", "v", "h")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("slice").orderBy("h", "v")))
      .filter(col("rn") <= k)
      .select("slice", "v", "h")
    VersionedStore.merge(combined, qsTable(root), Seq("slice"))
    VersionedStore.append(Seq(shardId).toDF("shard_id"),
      qsAppliedTable(root))
    true
  }

  /** Per-slice approximate quantiles straight from the persisted
    * sample — the same discrete definition as [[quantileSketch]]'s
    * sample half, over slices × k rows, the corpus never read. */
  def readQuantiles(spark: org.apache.spark.sql.SparkSession, root: String,
                    qs: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    import graft.offline.VersionedStore
    val stored = VersionedStore.read(spark, qsTable(root))
    // takedown suppression at slice granularity (see registerTakedown)
    val live = pendingTakedown(spark, root, "quantile") match {
      case Some(td) => suppressRows(stored, col("slice").cast("string"), td)
      case None => stored
    }
    pickQuantiles(live.select(col("slice"), col("v"), col("h")),
      Seq(col("slice")), qs, "sample")
  }

  // ---------------------------------------------------------------
  // Non-invertible store takedown (rebuild + interim suppression)
  // ---------------------------------------------------------------

  /** Valid `family` values for [[registerTakedown]]: the three
    * non-invertible sketch stores. CM is NOT here — its cells
    * subtract exactly via [[retractCm]]. */
  val NonInvertibleFamilies: Set[String] = Set("hll", "kmv", "quantile")

  private def takedownTable(root: String, family: String) =
    s"$root/${family}_takedown"

  private def appliedTableFor(root: String, family: String): String =
    family match {
      case "hll"      => sketchAppliedTable(root)
      case "kmv"      => kmvAppliedTable(root)
      case "quantile" => qsAppliedTable(root)
      case other => throw new IllegalArgumentException(
        s"unknown non-invertible sketch family '$other'")
    }

  /** `takedown:`/`rebuild:` are these ledgers' reserved verbs — a
    * shard named with them would alias retraction state, so the
    * idempotent-store upserts refuse them up front (the
    * [[graft.offline.Ledger.requireFrameFree]] precedent). */
  private[operators] def requireUnreservedNiShardId(shardId: String): Unit =
    require(!shardId.startsWith("takedown:") &&
      !shardId.startsWith("rebuild:"),
      s"shard id '$shardId' uses a reserved ledger prefix")

  /** The multi-column group identity as one string key (US-separated —
    * the same trick the dedup band keys use). */
  private def tdKeyExpr(cols: Seq[Column]): Column =
    concat_ws("\u0001", cols.map(_.cast("string")): _*)

  private def emptyTakedown(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    Seq.empty[String].toDF("td_key")
  }

  /** Register a TAKEDOWN against a non-invertible sketch store
    * (`family` ∈ hll | kmv | quantile): HLL registers, KMV bottom-k
    * rows, and quantile samples cannot un-see a key (a register max /
    * bottom-k survives any subtraction), so their retraction path is
    * a one-pass REBUILD from the remaining corpus
    * ([[rebuildSketchStore]] / [[rebuildKmvStore]] /
    * [[rebuildQuantileStore]]) — and until that lands, every read
    * ([[readDistinct]] / [[readOverlap]] / [[readQuantiles]])
    * suppresses the registered group/slice identities at serve time,
    * so a retracted group is never served from the stale sketch.
    *
    * `groups` carries the store's GROUP IDENTITY columns (HLL: the
    * build-time group columns in order; KMV/quantile: the slice
    * column) — the granularity at which the stored state is
    * separable, which is what makes interim suppression EXACT: an
    * untouched group's registers/rows are byte-identical in the
    * rebuilt store, and a suppressed group is absent from both. (A
    * KEY-level takedown cannot be served exactly from a stale
    * register sketch by construction — register it as the groups the
    * keys touched, over-suppressing until the rebuild restores them.)
    *
    * Ledger protocol (mirrors [[retractCm]]'s rigor, inverted for
    * idempotent stores): `takedown:<id>` appends to the store's shard
    * ledger when registered (replays no-op by id), the rebuild
    * appends `rebuild:<id>` and CLEARS the suppression table — so
    * ledger history records retraction the way retractCm's
    * intent/done rows record subtraction. Suppression keys accumulate
    * across multiple registrations until one rebuild clears them all.
    */
  def registerTakedown(groups: DataFrame, root: String, family: String,
                       takedownId: String): Boolean = {
    import graft.offline.VersionedStore
    require(NonInvertibleFamilies(family),
      s"takedown family must be one of $NonInvertibleFamilies (CM " +
        "retracts exactly via retractCm)")
    val spark = groups.sparkSession
    import spark.implicits._
    val ledgerTable = appliedTableFor(root, family)
    val seen = VersionedStore.read(spark, ledgerTable)
      .filter(col("shard_id") === s"takedown:$takedownId")
      .limit(1).count() > 0
    if (seen) return false
    // The suppression identity must be built in the STORE's column
    // order — a caller passing HLL group columns in a different order
    // would register keys no read ever matches, a SILENT compliance
    // miss. So validate against the stored schema and reorder; the
    // single-slice families just need one column.
    val idCols: Seq[String] = family match {
      case "hll" =>
        val stored = VersionedStore.read(spark, sketchTable(root))
          .columns.toSeq.filterNot(_ == "sketch")
        require(groups.columns.toSet == stored.toSet,
          s"takedown group columns ${groups.columns.toSeq} must match " +
            s"the store's group columns $stored")
        stored
      case _ =>
        require(groups.columns.length == 1,
          s"$family takedown groups carry exactly the slice column")
        groups.columns.toSeq
    }
    val keys = groups
      .select(tdKeyExpr(idCols.map(groups(_))).as("td_key"))
      .distinct()
    // create-or-merge: the table is absent before the first takedown
    // and EMPTY (a zero-file snapshot read() refuses) after a rebuild
    // cleared it — both mean "no pending keys to preserve"
    val tdRoot = takedownTable(root, family)
    val hasPending =
      try { VersionedStore.read(spark, tdRoot); true }
      catch { case _: IllegalArgumentException => false }
    if (hasPending) VersionedStore.merge(keys, tdRoot, Seq("td_key"))
    else VersionedStore.overwrite(keys, tdRoot)
    VersionedStore.append(Seq(s"takedown:$takedownId").toDF("shard_id"),
      ledgerTable)
    true
  }

  /** Pending suppression keys, or None when the store has none (also
    * tolerates stores built before the takedown table existed). */
  private def pendingTakedown(spark: org.apache.spark.sql.SparkSession,
                              root: String,
                              family: String): Option[DataFrame] =
    try {
      import graft.offline.VersionedStore
      val td = VersionedStore.read(spark, takedownTable(root, family))
      if (td.limit(1).isEmpty) None else Some(td)
    } catch {
      // missing table (store predates takedowns / none registered) or
      // the zero-file snapshot a rebuild's clear leaves — both are
      // read()'s require failures, both mean "nothing to suppress"
      case _: IllegalArgumentException => None
    }

  /** Serve-time suppression: a Bloom bitset over the takedown keys
    * probes every stored row IN THE SCAN STAGE (join-free for the
    * bloom-negative majority — the shape that composes into a 100 TB
    * scan or a streaming projection), and only bloom-POSITIVE rows
    * pay the exact broadcast anti-join. No false negatives (bloom's
    * contract) ⇒ every registered group is caught; the exact verify
    * on candidates ⇒ no innocent group is over-suppressed. Net:
    * exact suppression at prefilter cost.
    */
  private def suppressRows(rows: DataFrame, identity: Column,
                           takedown: DataFrame): DataFrame = {
    val mBits = 4096
    val kH = 2
    val bitset = bloomBitsetLit(takedown, "td_key", mBits, kH, fast = true)
    val flagged = rows.withColumn("__td_cand",
      bloomProbe(bitset, identity, mBits, kH, fast = true))
    val clean = flagged.filter(!col("__td_cand")).drop("__td_cand")
    val verified = flagged.filter(col("__td_cand")).drop("__td_cand")
      .join(broadcast(takedown.select(col("td_key"))),
        identity === col("td_key"), "left_anti")
    clean.union(verified)
  }

  /** Rebuild the HLL sketch store from the REMAINING corpus (the
    * caller supplies corpus-minus-retracted — registers cannot
    * reconstruct it) at the store's frozen p, clear the interim
    * suppression list, and record `rebuild:<id>` in the ledger. One
    * corpus pass — the same cost building the store was. The applied-
    * shard ledger survives: HLL folds are idempotent, so a shard
    * replayed after a rebuild is harmless either way.
    */
  def rebuildSketchStore(remaining: DataFrame, keyCol: String,
                         groupCols: Seq[String], root: String,
                         rebuildId: String): Unit = {
    import graft.offline.VersionedStore
    val spark = remaining.sparkSession
    import spark.implicits._
    val p = VersionedStore.read(spark, sketchParamsTable(root))
      .select("p").head().getLong(0).toInt
    VersionedStore.overwrite(
      hllSketchTable(remaining, keyCol, groupCols, p), sketchTable(root))
    VersionedStore.overwrite(emptyTakedown(spark), takedownTable(root, "hll"))
    VersionedStore.append(Seq(s"rebuild:$rebuildId").toDF("shard_id"),
      sketchAppliedTable(root))
  }

  /** KMV twin of [[rebuildSketchStore]] (frozen k read back). */
  def rebuildKmvStore(remaining: DataFrame, keyCol: String,
                      sliceCol: String, root: String,
                      rebuildId: String): Unit = {
    import graft.offline.VersionedStore
    val spark = remaining.sparkSession
    import spark.implicits._
    val k = kmvK(spark, root)
    VersionedStore.overwrite(
      kmvSketchRows(remaining, keyCol, sliceCol, k), kmvTable(root))
    VersionedStore.overwrite(emptyTakedown(spark), takedownTable(root, "kmv"))
    VersionedStore.append(Seq(s"rebuild:$rebuildId").toDF("shard_id"),
      kmvAppliedTable(root))
  }

  /** Quantile twin of [[rebuildSketchStore]] (frozen k read back). */
  def rebuildQuantileStore(remaining: DataFrame, valueCol: String,
                           idCol: String, sliceCol: String, root: String,
                           rebuildId: String): Unit = {
    import graft.offline.VersionedStore
    val spark = remaining.sparkSession
    import spark.implicits._
    val k = VersionedStore.read(spark, qsParamsTable(root))
      .select("k").head().getLong(0).toInt
    VersionedStore.overwrite(
      quantileSampleRows(remaining, valueCol, idCol, sliceCol, k),
      qsTable(root))
    VersionedStore.overwrite(emptyTakedown(spark),
      takedownTable(root, "quantile"))
    VersionedStore.append(Seq(s"rebuild:$rebuildId").toDF("shard_id"),
      qsAppliedTable(root))
  }

  // ---------------------------------------------------------------
  // Count-Min sketch (frequency / heavy hitters / join cardinality)
  // ---------------------------------------------------------------

  /** CM position of one key in row `di`. Default is the portable md5
    * family (the SQL oracle replays every cell); `fast = true` is the
    * PRODUCTION family — seed-salted xxhash64, one codegen hash per
    * (row, di) instead of an md5 digest over a built string (the
    * bloom-family precedent: ~3× cheaper on the 10M-row probe,
    * spec-held to the same one-sided/additive contracts). Build and
    * probe must use the same family. Both families hash the key's
    * STRING form — xxhash64 is type-sensitive, so without the cast a
    * long-keyed build probed with string keys would silently return
    * 0 for present keys, an undercount breaking the one-sided
    * contract. */
  private def cmPos(key: Column, di: Int, width: Int,
                    fast: Boolean): Column =
    if (fast) pmod(xxhash64(lit(di), key.cast("string")),
      lit(width.toLong))
    else Fns.md5Hash31(concat(lit(s"cm$di:"), key)) % width

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) as rows
    * (di, pos, cnt) [+ group cols]: `depth` hash rows of `width`
    * cells, each cell the COUNT of keys hashing there — the fourth
    * sketch leg ("how frequent", beside distinct / shared /
    * distributed). One corpus pass: explode the depth positions in
    * the scan stage, then one map-side-combinable groupBy; the sketch
    * is depth × width rows (kilobytes) regardless of corpus size.
    * Cells are ADDITIVE — sketches of shards sum cell-wise to the
    * sketch of the union — so the store pattern is the Dsir additive
    * ledger, not the idempotent register-max one.
    */
  def cmSketchRows(df: DataFrame, keyCol: String, depth: Int, width: Int,
                   groupCols: Seq[String] = Nil,
                   fast: Boolean = false): DataFrame = {
    require(depth >= 1 && width >= 2)
    val g = groupCols.map(col)
    df.filter(col(keyCol).isNotNull)
      .select(g :+ posexplode(array((0 until depth).map(i =>
        cmPos(col(keyCol), i, width, fast)): _*)).as(Seq("di", "pos")): _*)
      .groupBy(g :+ col("di") :+ col("pos"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for a WATCHLIST of keys: each probe's
    * estimate is the MIN over its depth cells (the CM guarantee:
    * estimate ≥ true count always — collisions only add). The sketch
    * broadcasts (≤ depth × width rows), so probing costs no shuffle
    * of either the corpus or the sketch: at 100 TB, "how often does
    * each of these 10k terms appear" is answered from kilobytes,
    * corpus never rescanned.
    */
  def cmPointEstimate(sketch: DataFrame, probes: DataFrame,
                      probeKeyCol: String, depth: Int, width: Int,
                      fast: Boolean = false): DataFrame = {
    val pp = probes
      .filter(col(probeKeyCol).isNotNull)
      .select(col(probeKeyCol).as("probe_key"),
        posexplode(array((0 until depth).map(i =>
          cmPos(col(probeKeyCol), i, width, fast)): _*)).as(Seq("di", "pos")))
    pp.join(broadcast(sketch.select(col("di"), col("pos"), col("cnt"))),
        Seq("di", "pos"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy("probe_key")
      .agg(min("cnt").as("cm_est"))
  }

  /** Equi-join OUTPUT-SIZE estimate from two CM sketches: the
    * AMS-style inner product min over rows of Σ_pos cntA·cntB —
    * always ≥ the true join size (cross terms from colliding keys
    * only add). This is the planner's pre-flight number: decide
    * broadcast-vs-shuffle or flag a fan-out join from two
    * kilobyte sketches BEFORE paying for the join itself.
    */
  def cmJoinSizeEstimate(skA: DataFrame, skB: DataFrame): DataFrame = {
    // Every depth row must contribute an ip to the min — a row with
    // ZERO overlapping cells proves the true join size is 0 (a shared
    // key would collide in every row), and dropping it from the min
    // (the inner join's group-less case) would report a large
    // estimate where the provable answer is 0. So materialize ip = 0
    // for overlap-free depth rows via a left join from the depth-row
    // set; two empty sketches fall through to the outer coalesce.
    val dis = skA.select(col("di")).union(skB.select(col("di"))).distinct()
    val overlap = skA.select(col("di"), col("pos"), col("cnt").as("ca"))
      .join(skB.select(col("di"), col("pos"), col("cnt").as("cb")),
        Seq("di", "pos"))
      .groupBy("di").agg(sum(col("ca") * col("cb")).as("ip0"))
    dis.join(overlap, Seq("di"), "left")
      .select(coalesce(col("ip0"), lit(0L)).as("ip"))
      .agg(coalesce(min("ip"), lit(0L)).as("join_size_est"))
  }

  /** Exact-arithmetic summary statistics of one CM sketch, each a
    * PROVABLE bound, not an estimate:
    *  - `n_rows`: the sketched row count (every depth row sums to it;
    *    min() is just the safe fold).
    *  - `hot_bound`: an upper bound on the HOTTEST key's count — for
    *    any key k and row i, count(k) ≤ cell_i(h_i(k)) ≤ max_pos
    *    cell_i, so count(k) ≤ min_i(max_pos cell_i). The skew
    *    detector's input.
    *  - `distinct_lb`: a lower bound on distinct keys — each row's
    *    nonzero cells ≤ distinct, so max_i(nnz_i) ≤ distinct.
    * All integer, so cross-engine exact.
    */
  def cmStats(sketch: DataFrame): DataFrame =
    // explicit zero-count cells (a retractCm residue) are NOT nonzero
    // cells — counting them would inflate distinct_lb past a bound
    // An all-empty sketch (zero nonzero cells) must report 0, not
    // NULL: NULL n_rows would slip through cmJoinPlan's least() (which
    // ignores NULLs) and drive the broadcast pick off a null compare.
    sketch.filter(col("cnt") > 0).groupBy("di")
      .agg(sum("cnt").as("n"), max("cnt").as("mx"),
        count(lit(1)).as("nnz"))
      .agg(coalesce(min("n"), lit(0L)).as("n_rows"),
        coalesce(min("mx"), lit(0L)).as("hot_bound"),
        coalesce(max("nnz"), lit(0L)).as("distinct_lb"))

  /** Pre-flight join advisory from two CM sketches — the AQE-style
    * planning decision taken BEFORE the join runs, from kilobytes:
    *  - `broadcast_a`/`broadcast_b` when the smaller side fits the
    *    broadcast budget (rows, the sketch's exact n);
    *  - `shuffle_salted` when either side's provable hot-key bound
    *    exceeds `skewFactor` × its average-per-key upper bound
    *    (hot_bound · distinct_lb ≥ skewFactor · n — integer-closed,
    *    so the oracle replays the decision exactly);
    *  - `shuffle` otherwise.
    * Alongside: the AMS join-size estimate (one-sided ≥ truth, so a
    * fan-out join is never missed). At 100 TB this row costs two
    * one-pass constant-size sketches; the decision it informs costs
    * the cluster hours when wrong.
    */
  def cmJoinPlan(skA: DataFrame, skB: DataFrame,
                 broadcastRows: Long = 5000L,
                 skewFactor: Long = 8L): DataFrame = {
    val sa = cmStats(skA).select(col("n_rows").as("n_a"),
      col("hot_bound").as("hot_a"), col("distinct_lb").as("distinct_a_lb"))
    val sb = cmStats(skB).select(col("n_rows").as("n_b"),
      col("hot_bound").as("hot_b"), col("distinct_lb").as("distinct_b_lb"))
    sa.crossJoin(sb).crossJoin(cmJoinSizeEstimate(skA, skB))
      .withColumn("strategy",
        when(least(col("n_a"), col("n_b")) <= broadcastRows,
          when(col("n_a") <= col("n_b"), lit("broadcast_a"))
            .otherwise(lit("broadcast_b")))
        .when(col("hot_a") * col("distinct_a_lb") >=
                lit(skewFactor) * col("n_a") ||
              col("hot_b") * col("distinct_b_lb") >=
                lit(skewFactor) * col("n_b"),
          lit("shuffle_salted"))
        .otherwise(lit("shuffle")))
  }

  // Persisted CM store (additive → Dsir-style shard ledger).
  private def cmTable(root: String) = s"$root/cm_sketch"
  private def cmParamsTable(root: String) = s"$root/cm_params"
  private def cmAppliedTable(root: String) = s"$root/cm_applied"

  /** Initialize the persisted CM store: the sketch cells as a
    * VersionedStore table keyed (di, pos), plus params and the shard
    * ledger. Counts are additive — a replayed shard WOULD
    * double-count — so ingest runs the engine-wide EXACTLY-once
    * intent/done protocol ([[graft.offline.Ledger.ingestOnce]]).
    */
  def buildCmStore(df: DataFrame, keyCol: String, root: String,
                   depth: Int = 3, width: Int = 1024,
                   fast: Boolean = false): Unit = {
    import graft.offline.VersionedStore
    val spark = df.sparkSession
    import spark.implicits._
    VersionedStore.overwrite(
      cmSketchRows(df, keyCol, depth, width, fast = fast), cmTable(root))
    VersionedStore.overwrite(
      Seq((depth.toLong, width.toLong, fast)).toDF("depth", "width", "fast"),
      cmParamsTable(root))
    VersionedStore.overwrite(
      Seq("__init__").toDF("shard_id"), cmAppliedTable(root))
  }

  /** Fold one shard's keys into the stored cells additively: a keyed
    * MERGE on (di, pos) after summing shard counts into current ones.
    * Replays no-op by the ledger (additive counts have no idempotence
    * net). Returns whether the shard was applied.
    */
  // Ledger mechanics (rows, frame-character guard, intent/done
  // recovery) live in graft.offline.Ledger — shared by every
  // additive count store.

  def upsertCm(shardDf: DataFrame, keyCol: String, root: String,
               shardId: String): Boolean = {
    import graft.offline.{Ledger, VersionedStore}
    val spark = shardDf.sparkSession
    Ledger.requireFrameFree(shardId)
    if (Ledger.isApplied(spark, cmAppliedTable(root), shardId))
      return false // replays answer before the params read
    val p = VersionedStore.read(spark, cmParamsTable(root))
      .select("depth", "width", "fast").head()
    // EXACTLY-once under the engine-wide intent/done ingest protocol
    // (Ledger.ingestOnce — same crash-window arithmetic retractCm
    // already carries, now on the ingest side too): a replayed crash
    // finishes the ledger or redoes the merge, never double-counts.
    Ledger.ingestOnce(spark, cmAppliedTable(root), cmTable(root),
      Seq("di", "pos"), Seq("cnt"),
      cmSketchRows(shardDf, keyCol, p.getLong(0).toInt,
        p.getLong(1).toInt, fast = p.getBoolean(2)),
      shardId)
  }

  /** Retract one previously-ingested shard from the CM store — the
    * right-to-be-forgotten path the additive sketch UNIQUELY has:
    * counts subtract EXACTLY (unlike HLL registers / KMV / quantile
    * bottom-k, which are non-invertible: a register max or a bottom-k
    * cannot un-see a key, so their takedown path is a rebuild —
    * cheap, every sketch is one corpus pass — with serve-time
    * suppression via the bloom takedown filter in the interim), so
    * after retraction the LATEST version's cells equal a store that
    * never saw the shard (exhausted cells are deleted; any residue a
    * crash leaves is zero-count, which [[cmStats]] and
    * [[cmPointEstimate]] treat as absent). Like
    * [[graft.offline.VersionedStore.deleteKeys]], this retires
    * current state only — PRE-retraction snapshots stay readable via
    * `versionAsOf` until the caller pairs it with `vacuum`, the
    * compliance convention of every delete path in the engine.
    *
    * Replay safety: a double subtraction would push cells NEGATIVE —
    * an undercount, the forbidden direction for a one-sided sketch —
    * so unlike upsert the ledger row alone is not enough. The
    * protocol writes an INTENT row carrying the exact expected
    * post-retraction total before touching cells, then the cell
    * merge, then the DONE row. A crashed retraction's retry compares
    * the store's current total against the intent: already at the
    * expected total → just finish the ledger; still pre-retraction →
    * redo the merge; anything else means another writer interleaved
    * and the call fails LOUDLY (IllegalStateException) instead of
    * guessing — the single-maintainer-per-store discipline every
    * ledgered artifact in the engine already assumes. Retracting a
    * shard that is not currently applied (never ingested, or already
    * retracted; generation-counted, so ingest→retract→ingest cycles
    * work) returns false.
    */
  def retractCm(shardDf: DataFrame, keyCol: String, root: String,
                shardId: String): Boolean = {
    import graft.offline.{Ledger, VersionedStore}
    val spark = shardDf.sparkSession
    val p = VersionedStore.read(spark, cmParamsTable(root))
      .select("depth", "width", "fast").head()
    // exhausted cells are retired by the shared protocol; any
    // would-empty residue stays as zero rows, which cmStats /
    // cmPointEstimate already treat as absent
    Ledger.retractOnce(spark, cmAppliedTable(root), cmTable(root),
      Seq("di", "pos"), Seq("cnt"),
      cmSketchRows(shardDf, keyCol, p.getLong(0).toInt,
        p.getLong(1).toInt, fast = p.getBoolean(2)),
      shardId)
  }

  /** The persisted CM sketch cells, zero-count retraction residue
    * filtered (cmStats/cmPointEstimate already treat it as absent) —
    * the kilobyte frame planners feed to [[cmJoinPlan]] so repeated
    * join planning never rescans a corpus. */
  def readCmSketch(spark: org.apache.spark.sql.SparkSession,
                   root: String): DataFrame =
    graft.offline.VersionedStore.read(spark, cmTable(root))
      .filter(col("cnt") > 0)

  /** The store's frozen (depth, width, fast) parameters. */
  def readCmParams(spark: org.apache.spark.sql.SparkSession,
                   root: String): (Int, Int, Boolean) = {
    val p = graft.offline.VersionedStore.read(spark, cmParamsTable(root))
      .select("depth", "width", "fast").head()
    (p.getLong(0).toInt, p.getLong(1).toInt, p.getBoolean(2))
  }

  /** Watchlist point estimates straight from the persisted CM store. */
  def readCmEstimates(spark: org.apache.spark.sql.SparkSession, root: String,
                      probes: DataFrame, probeKeyCol: String): DataFrame = {
    import graft.offline.VersionedStore
    val p = VersionedStore.read(spark, cmParamsTable(root))
      .select("depth", "width", "fast").head()
    cmPointEstimate(VersionedStore.read(spark, cmTable(root)),
      probes, probeKeyCol, p.getLong(0).toInt, p.getLong(1).toInt,
      fast = p.getBoolean(2))
  }

  // ---------------------------------------------------------------
  // Bloom-filter membership
  // ---------------------------------------------------------------

  /** Bloom positions of one key: kHashes md5 draws (salted by hash
    * index) into [0, mBits) — the ORACLE-REPLAYABLE family (md5 is
    * the engine's portable hash, but it is a cryptographic digest:
    * ~3 digests/row dominate a scan at tens of millions of rows). */
  def bloomPositions(key: Column, mBits: Int, kHashes: Int): Seq[Column] =
    (0 until kHashes).map { i =>
      Fns.md5Hash31(concat(lit(s"bloom$i:"), key)) % mBits
    }

  /** The PRODUCTION hash family: seed-salted xxhash64 (one cheap
    * codegen hash per probe, no string building). Not expressible in
    * portable SQL — spec-held to the same no-false-negative contract
    * instead of the oracle. Build and probe must use the same family.
    */
  def bloomPositionsXx(key: Column, mBits: Int, kHashes: Int): Seq[Column] =
    (0 until kHashes).map { i =>
      pmod(xxhash64(lit(i), key), lit(mBits.toLong))
    }

  private def positionsFor(key: Column, mBits: Int, kHashes: Int,
                           fast: Boolean): Seq[Column] =
    if (fast) bloomPositionsXx(key, mBits, kHashes)
    else bloomPositions(key, mBits, kHashes)

  /** Membership of every row's key against a DROP LIST compiled to a
    * Bloom filter, with the exact answer audited alongside: the list
    * (takedown ids, decontamination keys, a dedup drop set) becomes
    * a set of ≤ mBits bit positions — kilobytes, broadcast to every
    * executor — instead of a list-sized join side. No false
    * negatives by construction (spec-held); false positives are the
    * rows the filter would over-drop, surfaced per row and
    * measurable as a rate, which is the engineering dial: at 100 TB
    * a Bloom pre-filter in the scan stage cuts the exact
    * anti-join's probe side to bloom-positive rows only, so the
    * expensive join touches ~(true + FP-rate) of the corpus rather
    * than all of it.
    *
    * In-plan shape (oracle-replayable): drop list → explode kHashes
    * positions → distinct (the "bitset" as rows, ≤ mBits of them,
    * auto-broadcast); probe side explodes its kHashes positions and
    * might-contain is "all kHashes positions present" (count == k
    * after an inner join). [[bloomBitsetLit]] compiles the same
    * positions to a literal long-array bitset probed by pure bit
    * arithmetic — zero joins — for the serving / streaming path.
    */
  def bloomMembership(probe: DataFrame, keyCol: String, dropKeys: DataFrame,
                      dropKeyCol: String, mBits: Int = 2048,
                      kHashes: Int = 2, fast: Boolean = false): DataFrame = {
    val setPos = dropKeys
      .select(explode(array(
        positionsFor(col(dropKeyCol), mBits, kHashes, fast): _*)).as("pos"))
      .distinct()
    val probePos = probe
      .select(col(keyCol).as("probe_key"),
        posexplode(array(positionsFor(col(keyCol), mBits, kHashes, fast): _*))
          .as(Seq("hash_i", "pos")))
    // DISTINCT hash indices, not row count: a probe key duplicated d
    // times contributes d copies of each (hash_i, pos) row, and a
    // plain count would see d*kHashes hits and miss the === kHashes
    // test — a false NEGATIVE, the one direction the filter must
    // never err. Distinct hash_i is invariant to probe multiplicity.
    val hits = probePos
      .join(broadcast(setPos), "pos")
      .groupBy("probe_key")
      .agg(countDistinct(col("hash_i")).as("n_pos_hit"))
    probe
      .join(hits, probe(keyCol) === hits("probe_key"), "left")
      .drop("probe_key")
      .withColumn("bloom_hit", coalesce(col("n_pos_hit"), lit(0L)) === kHashes)
      .drop("n_pos_hit")
  }

  /** The same Bloom bitset as a literal array<long> Column (built by
    * one driver-bounded collect of ≤ mBits/64 longs) and a pure-
    * arithmetic probe — the broadcast-free serving/streaming form:
    * `probeCol` is usable in any projection, including a stream's.
    */
  def bloomBitsetLit(dropKeys: DataFrame, dropKeyCol: String,
                     mBits: Int, kHashes: Int,
                     fast: Boolean = false): Column =
    lit(bloomBitsetWords(dropKeys, dropKeyCol, mBits, kHashes, fast))

  /** [[bloomBitsetLit]]'s raw long words — for callers that persist
    * or ship the bitset as a value (the frozen-artifact twins)
    * rather than inlining it as a literal Column immediately. */
  def bloomBitsetWords(dropKeys: DataFrame, dropKeyCol: String,
                       mBits: Int, kHashes: Int,
                       fast: Boolean = false): Array[Long] = {
    val words = new Array[Long]((mBits + 63) / 64)
    dropKeys
      .select(explode(array(
        positionsFor(col(dropKeyCol), mBits, kHashes, fast): _*)).as("pos"))
      .distinct().collect()
      .foreach { r =>
        val p = r.getLong(0).toInt
        words(p >>> 6) |= (1L << (p & 63))
      }
    words
  }

  /** Pure-projection probe of [[bloomBitsetLit]]'s bitset. */
  def bloomProbe(bitset: Column, key: Column, mBits: Int,
                 kHashes: Int, fast: Boolean = false): Column =
    positionsFor(key, mBits, kHashes, fast)
      .map { pos =>
        // shiftright with a COLUMN shift amount: functions.shiftright
        // only takes a literal Int, so bridge to the Catalyst node.
        val word = element_at(bitset, (pos / 64).cast("int") + 1)
        val shifted = GraftColumnBridge.column(
          org.apache.spark.sql.catalyst.expressions.ShiftRight(
            GraftColumnBridge.expression(word),
            GraftColumnBridge.expression((pos % 64).cast("int"))))
        shifted.bitwiseAND(1L) === 1L
      }
      .reduce(_ && _)
}
