package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** DoReMi-style DOMAIN REWEIGHTING (Xie et al. 2023, "DoReMi:
  * Optimizing Data Mixtures Speeds Up Language Model Pretraining" —
  * itself the Group-DRO multiplicative-weights update of Sagawa et
  * al. 2020 applied to pretraining domains): learn the per-domain
  * mixture weights α that a 100 TB corpus build feeds into
  * [[FeatureEng.domainMix]], by exponentiated-gradient ascent on
  * per-domain EXCESS LOSS, instead of hand-picking shares.
  *
  * Reference behavior: the reference repo's python pipelines mix
  * training sources with static fractions (the dataset-composition
  * pattern of its example pipelines); this operator adds the
  * learned-mixture upgrade the published LLM-data pipelines use.
  *
  * WHAT STANDS IN FOR THE PROXY/REFERENCE MODELS: DoReMi proper
  * interleaves the weight update with proxy-model training steps —
  * out of scope for a data engine. The update machinery here is
  * exact and pluggable; the default excess-loss signal is the gap
  * between the corpus's own UNIGRAM LM surprise ([[TextAnalysis
  * .lmScore]]'s model) and its interpolated KNESER-NEY BIGRAM
  * surprise ([[TextAnalysis.knBigramScore]]'s model, shared
  * arithmetic — the fits cannot drift): domains where bigram context
  * explains little beyond unigram frequencies (small gap) have less
  * learnable structure than domains where it explains a lot. Any
  * per-domain loss table can be fed to [[weightsFromExcess]] instead.
  *
  * DETERMINISM (the engine's fixed-point idiom, cf. LinkGraph's
  * integer PageRank): per-token surprise is a pure function of
  * integer counts, rounded to 1e-6 micros ONCE per row, then summed
  * EXACTLY as longs (associative — partitioning-independent); the
  * multiplicative-weights loop uses the (1 + η·excess) update form
  * (first-order equal to exp(η·excess), the classic Arora-Hazan-Kale
  * MW variant) so every iterate is INTEGER arithmetic and the SQL
  * oracle replays the whole trajectory step by step. No exp/pow
  * touches the update loop itself. RESIDUAL cross-engine risk,
  * declared: the per-token surprise micro is round(-1e6·log2(cnt/
  * tot)) and log2 is a transcendental whose last ulp may differ
  * between the JVM and DuckDB libm — a value within ~1 ulp (≈1e-9
  * relative) of a half-micro boundary could round apart and, because
  * it feeds integer state, flip the whole table. The exposure is
  * bounded by DISTINCT model inputs, not tokens (surprise is a pure
  * function of (cnt, tot) / the KN count tuple — hundreds to
  * thousands of distinct values per corpus), so the flip probability
  * is ~1e-6-scale per corpus; the same class of risk every
  * round()-over-double oracle in this engine already carries, noted
  * here because the amplification is table-wide rather than row-wide.
  *
  * SCALE SHAPE: two corpus scans (token stream + bigram stream, the
  * same scans the two LM fits already cost — both map-side-combining
  * aggregates joined against vocabulary-bounded model tables); after
  * that, the MW loop runs over the |domains|-row excess table
  * (kilobytes — localCheckpointed once, each step a broadcast of a
  * 1-row sum). Nothing in the loop touches the corpus again.
  */
object Doremi {

  private val M = 1000000L // 1e6 micros

  /** Per-domain token/bigram surprise sums and the EXCESS LOSS in
    * integer micros: excess_d = max(0, mean unigram surprise −
    * mean KN-bigram surprise), both in bits (log2), means by integer
    * division over exact long sums. Returns one row per domain:
    * (source, n_tokens, n_bigrams, uni_mean_micro, kn_mean_micro,
    * excess_micro). Domains whose docs are all shorter than 2 words
    * get excess 0 (no bigram evidence — neutral, never NULL).
    */
  def domainExcess(docs: DataFrame, idCol: String, textCol: String,
                   srcCol: String, discount: Double = 0.75): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      col(srcCol).as("source"),
      graft.functions.Fns.words(col(textCol)).as("ws"))
    // unigram surprise stream: freq table is vocabulary-sized
    val toks = base.select(col("source"), explode(col("ws")).as("w"))
    val freq = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false) // feeds the join AND the total
    val tot = freq.agg(sum("cnt").as("tot"))
    val uni = toks.join(freq, "w").crossJoin(broadcast(tot))
      .select(col("source"),
        expr(s"CAST(round(-$M * log2(cnt * 1.0 / tot)) AS BIGINT)")
          .as("sur"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), sum("sur").as("uni_sum"))
    // KN bigram surprise stream: the EXACT model arithmetic of
    // TextAnalysis.knBigramScore (shared knModelFromCounts)
    val bg = TextAnalysis.knDocBigrams(
      base.select(col("source").as("doc_id"), col("ws")))
      .withColumnRenamed("doc_id", "source")
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(false)
    val model = TextAnalysis.knModelFromCounts(c12, discount)
    val kn = bg.join(model, Seq("w1", "w2"))
      .select(col("source"),
        expr(s"CAST(round(-$M * log2(p_kn)) AS BIGINT)").as("sur"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_bigrams"), sum("sur").as("kn_sum"))
    uni.join(kn, Seq("source"), "left")
      .na.fill(0L, Seq("n_bigrams", "kn_sum"))
      .select(col("source"), col("n_tokens"), col("n_bigrams"),
        expr("uni_sum DIV n_tokens").as("uni_mean_micro"),
        when(col("n_bigrams") > 0, expr("kn_sum DIV n_bigrams"))
          .otherwise(expr("uni_sum DIV n_tokens")).as("kn_mean_micro"))
      .withColumn("excess_micro",
        greatest(lit(0L), col("uni_mean_micro") - col("kn_mean_micro")))
  }

  /** The multiplicative-weights trajectory over a per-domain excess
    * table: w₀ uniform; w'_d ← w_d·(1 + η·excess_d); normalize to
    * micros each step; final α_d = mean of the normalized iterates
    * (DoReMi averages the trajectory, not the endpoint), smoothed
    * toward uniform by `smoothMicro` (DoReMi's ε-uniform smoothing).
    * ALL integer arithmetic — the oracle unrolls the identical steps.
    *
    * `excess` must have (source, excess_micro) — extra columns ride
    * along untouched. Returns the input plus (alpha_micro,
    * share_micro). The table is |domains|-rowed: each step costs one
    * kilobyte-scale aggregate; iterates are localCheckpointed so the
    * plan does not double per step.
    */
  def weightsFromExcess(excess: DataFrame, etaMicro: Long = 500000L,
                        steps: Int = 5,
                        smoothMicro: Long = 10000L): DataFrame = {
    require(etaMicro > 0 && steps >= 1 && smoothMicro >= 0 &&
      smoothMicro <= M)
    // loud, not silent: the loop's working columns would clobber (and
    // the final drop delete) same-named caller columns — the joinAuto
    // refuse-shared-names contract
    val reserved = Set("factor", "w", "traj", "u", "tot_u", "k",
      "alpha_micro", "share_micro")
    val clash = excess.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"excess table must not carry reserved columns $clash — rename them")
    val k = excess.agg(count(lit(1)).as("k"))
    var cur = excess.crossJoin(broadcast(k))
      .withColumn("factor",
        lit(M) + expr(s"($etaMicro * excess_micro + 500000) DIV $M"))
      .withColumn("w", expr(s"$M DIV k"))
      .withColumn("traj", lit(0L))
      .localCheckpoint(false)
    var t = 0
    while (t < steps) {
      val u = cur.withColumn("u", expr(s"(w * factor + 500000) DIV $M"))
      val totU = u.agg(sum("u").as("tot_u"))
      cur = u.crossJoin(broadcast(totU))
        .withColumn("w", expr(s"(u * $M) DIV tot_u"))
        .withColumn("traj", col("traj") + col("w"))
        .drop("u", "tot_u")
        .localCheckpoint(false)
      t += 1
    }
    cur.withColumn("alpha_micro", expr(s"traj DIV $steps"))
      .withColumn("share_micro",
        expr(s"(($M - $smoothMicro) * alpha_micro) DIV $M" +
          s" + $smoothMicro DIV k"))
      .drop("factor", "w", "traj", "k")
  }

  /** The packaged fit: corpus in, learned per-domain mixture out —
    * (source, n_tokens, n_bigrams, uni_mean_micro, kn_mean_micro,
    * excess_micro, alpha_micro, share_micro). */
  def domainWeights(docs: DataFrame, idCol: String, textCol: String,
                    srcCol: String, etaMicro: Long = 500000L,
                    steps: Int = 5, smoothMicro: Long = 10000L,
                    discount: Double = 0.75): DataFrame =
    weightsFromExcess(
      domainExcess(docs, idCol, textCol, srcCol, discount),
      etaMicro, steps, smoothMicro)

  /** APPLY the learned mixture: [[FeatureEng.domainMix]]'s machinery
    * (largest-achievable-corpus scale, basis-point rates, md5-bucket
    * determinism) with targetShares = the learned share_micro table
    * instead of hand-picked constants. One extra corpus scan for the
    * per-doc token counts; the rate table (|domains| rows) broadcasts.
    * Returns (doc_id, source, n_tokens, share_micro, sample_bucket,
    * rate_bp) — the q_domain_mix shape plus the learned share.
    */
  def domainMixLearned(docs: DataFrame, idCol: String, textCol: String,
                       srcCol: String, etaMicro: Long = 500000L,
                       steps: Int = 5, smoothMicro: Long = 10000L)
  : DataFrame = {
    // the learned share table through THE shared rate machinery
    // (FeatureEng.mixRates/mixApply — one code path with
    // q_domain_mix / q_temperature_mix / cluster balance)
    val perSrc = domainWeights(docs, idCol, textCol, srcCol,
        etaMicro, steps, smoothMicro)
      .select(col("source"), col("n_tokens").as("src_tokens"),
        col("share_micro"),
        (col("share_micro") / lit(M.toDouble)).as("share"))
    val base = docs.select(col(idCol).as("doc_id"),
      col(srcCol).as("source"),
      size(graft.functions.Fns.words(col(textCol))).cast("long")
        .as("n_tokens"))
    FeatureEng.mixApply(base, FeatureEng.mixRates(perSrc),
      Seq("doc_id", "source", "n_tokens", "share_micro",
        "sample_bucket", "rate_bp"))
  }
}
