package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-style SUPERVISED quality classifier (Joulin et al. 2017,
  * "Bag of Tricks for Efficient Text Classification") — the model
  * family the DCLM pipeline distills its quality filter into (a
  * fastText classifier over hashed word n-grams), one step past
  * [[Classify]]'s Naive Bayes: where NB scores tokens independently,
  * this LEARNS a bucket embedding table E (nBuckets × dim), averages
  * a document's gram embeddings into a hidden vector, and fits a
  * logistic output (w, b) — trained here by full-batch gradient
  * descent with the model on the driver and every corpus-sized
  * reduction a Spark aggregate.
  *
  * Reference behavior: the reference repo trains external quality
  * classifiers offline and applies them as score columns (the
  * feature_store python pipelines' model-scoring pattern); the
  * engine's own precedent is q_nb_quality (train on a labeled seed,
  * apply corpus-wide). This operator completes the DCLM shape with
  * the learned-embedding classifier proper.
  *
  * DETERMINISM (the engine's integer-micro idiom): every model
  * number lives in 1e-6 fixed-point longs. Per-row gradient terms are
  * rounded to micros ONCE, then summed EXACTLY by Spark aggregates
  * (long addition is associative-commutative → partitioning-
  * independent), and the driver applies updates with one rounding
  * rule — so the distributed fit equals a sequential in-memory
  * reference bit for bit (spec-held), the same contract as
  * Unigram.trainFromCounts / LinkGraph's fixed-point PageRank.
  *
  * SCALE SHAPE: the classifier trains on a LABELED SEED (thousands
  * of docs — the DCLM/fastText setting), so the per-epoch cost is
  * two map-side-combinable aggregates over the seed's cached
  * (doc, bucket, cnt) table: one per-doc reduce for the forward
  * pass, one per-bucket reduce for the gradient. Driver state is
  * nBuckets × dim longs (megabytes). Corpus-wide APPLICATION is the
  * frozen path: per-bucket scalar scores s_f = w·E_f collapse the
  * bilinear model into exactly [[graft.functions.HashedGramScore]]'s
  * codegen projection — zero joins, zero shuffles, stream-safe (the
  * Dsir frozen-scorer vehicle, reused verbatim).
  *
  * Gram features are [[Dsir.hashedNgramCounts]]' hashed unigrams +
  * bigrams (portable md5 buckets), so the trainer, the frozen
  * scorer, and the spec reference all see identical features.
  */
object FtClassify {

  /** The trained artifact: embeddings flattened row-major
    * (bucket * dim + k), output weights, bias — all 1e-6 micros. */
  final case class FtModel(nBuckets: Int, dim: Int, emb: Array[Long],
                           w: Array[Long], bMicro: Long,
                           lossMicroByEpoch: Seq[Long]) {
    require(emb.length == nBuckets * dim && w.length == dim)

    /** Collapse to the per-bucket scalar serving artifact:
      * s_f = round(w·E_f / 1e6) micros — the frozen model is ONE
      * number per bucket regardless of dim. */
    def bucketScores: Map[Long, Long] = {
      val m = Map.newBuilder[Long, Long]
      var f = 0
      while (f < nBuckets) {
        var acc = 0L
        var k = 0
        while (k < dim) { acc += w(k) * emb(f * dim + k); k += 1 }
        m += (f.toLong -> rdiv(acc))
        f += 1
      }
      m.result()
    }
  }

  /** Round-half-up division by 1e6 — THE rounding rule every micro
    * product in this object uses (floorDiv keeps it total-order
    * deterministic for negatives too). */
  private def rdiv(x: Long): Long = Math.floorDiv(x + 500000L, 1000000L)

  /** SQL `round()` semantics (HALF_UP — ties away from zero) for the
    * reference trainer's double terms: `math.round` floors ties for
    * negatives, SQL does not, and the err·cnt/m term CAN be negative. */
  private def sqlRound(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  /** Seeded uniform init in (-scale, +scale) micros — xxhash64 of the
    * flat index, so the init is a pure function of (seed, shape). */
  private def initMicro(idx: Long, seed: Long, scaleMicro: Long): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashLong(idx, seed)
    // top 53 bits → uniform in [0,1), then shift to (-1,1)
    val u = ((h >>> 11) + 0.5) * (1.0 / (1L << 53))
    math.round((2.0 * u - 1.0) * scaleMicro)
  }

  /** Train by full-batch GD on `seed` (idCol, textCol, labelCol with
    * boolean/0-1 labels). Returns the model plus the per-epoch
    * training loss (micro mean logistic loss) so callers can assert
    * the fit converges. */
  def train(seed: DataFrame, idCol: String, textCol: String,
            labelCol: String, nBuckets: Int = 4096, dim: Int = 8,
            epochs: Int = 40, lrMicro: Long = 16000000L,
            seedSalt: Long = 42L): FtModel = {
    require(nBuckets > 0 && dim > 0 && epochs >= 1 && lrMicro > 0)
    val spark = seed.sparkSession
    import spark.implicits._
    // (doc_id, bucket, cnt, y, m): the epoch-invariant feature table
    val feats = Dsir.hashedNgramCounts(
        seed.select(col(idCol).as("doc_id"),
          col(textCol).as("text"),
          col(labelCol).cast("boolean").as("y")),
        "doc_id", "text", nBuckets, Seq("y" -> col("y")))
      .localCheckpoint(false)
    val docSizes = feats.groupBy("doc_id", "y")
      .agg(sum("cnt").as("m"))
    val pairs = feats.join(docSizes, Seq("doc_id", "y"))
      .select(col("doc_id"), col("y"), col("bucket"), col("cnt"),
        col("m"))
      .localCheckpoint(false)
    val nDocs = docSizes.count()
    require(nDocs > 0, "empty training seed")

    val emb = Array.tabulate(nBuckets * dim)(i =>
      initMicro(i.toLong, seedSalt, 100000L)) // ±0.1
    // w random too: from w = 0 the bilinear fit sits on a saddle
    // (grad_E ∝ w) and only w moves in epoch 1 — seeded nonzero init
    // gives both layers gradient flow immediately (fastText trades
    // this for many per-example steps; full-batch GD cannot)
    val w = Array.tabulate(dim)(k =>
      initMicro(nBuckets.toLong * dim + k, seedSalt, 100000L))
    var b = 0L
    // classical momentum (β = 0.9, integer-exact): full-batch GD on
    // the bilinear model crawls at safe step sizes — the velocity
    // term converges in ~4× fewer epochs at the same stability
    // (decayed-lr sweep held on the gate corpus)
    val vEmb = new Array[Long](nBuckets * dim)
    val vW = new Array[Long](dim)
    var vB = 0L
    val losses = Seq.newBuilder[Long]

    var e = 0
    while (e < epochs) {
      // forward: s_f scalars → per-doc logit/error/loss in ONE frame
      // (checkpointed — it feeds the scalar sums AND the gradient);
      // each per-doc number is one double round-trip over exact
      // integer inputs, deterministic per row
      val sDf = bucketScoresOf(nBuckets, dim, emb, w)
        .toSeq.toDF("bucket", "s_micro")
      val bM = b
      val perDoc = pairs
        .join(broadcast(sDf), Seq("bucket"))
        .groupBy("doc_id", "y", "m")
        .agg(sum(col("cnt") * col("s_micro")).as("sum_s"),
          collect_list(struct(col("bucket"), col("cnt"))).as("fs"))
        .withColumn("p_micro", expr(
          s"CAST(round(1e6 / (1.0 + exp(-((sum_s / m + $bM) / 1e6)))) AS BIGINT)"))
        .withColumn("err_micro",
          col("p_micro") - when(col("y"), 1000000L).otherwise(0L))
        .localCheckpoint(false)
      // logistic loss in micros: -ln(p) for y=1, -ln(1-p) for y=0,
      // p clamped a micro off the rails so the log stays finite
      val sums = perDoc.agg(
          sum("err_micro").as("err_sum"),
          sum(expr("""CAST(round(-1e6 * ln(
                CASE WHEN y THEN greatest(p_micro, 1) / 1e6
                     ELSE greatest(1000000 - p_micro, 1) / 1e6 END))
              AS BIGINT)""")).as("loss_sum"))
        .head()
      losses += Math.floorDiv(sums.getLong(1), nDocs)
      // backward: coef_f = Σ_docs∋f cnt·err/m (micros, exact sum of
      // per-row rounded terms) — the only bucket-sized reduce
      val coefRows = perDoc
        .select(col("m"), col("err_micro"), explode(col("fs")).as("f"))
        .select(col("f.bucket").as("bucket"),
          expr("CAST(round(CAST(err_micro AS DOUBLE) * f.cnt / m) AS BIGINT)")
            .as("term"))
        .groupBy("bucket").agg(sum("term").as("coef"))
        .collect()
      val coef = new Array[Long](nBuckets)
      coefRows.foreach(r => coef(r.getLong(0).toInt) = r.getLong(1))
      val lrE = decayedLr(lrMicro, e, epochs)
      applyUpdates(nBuckets, dim, emb, w, coef, lrE, nDocs, vEmb, vW)
      vB = Math.floorDiv(9L * vB, 10L) +
        roundDiv(lrE * sums.getLong(0), 1000000L * nDocs)
      b -= vB
      e += 1
    }
    FtModel(nBuckets, dim, emb, w, b, losses.result())
  }

  /** fastText's linear learning-rate decay, integer-exact:
    * lr_e = lr·(epochs - e)/epochs — full-batch GD oscillates at a
    * fixed step once the logits sharpen; the decay anneals it. */
  private def decayedLr(lrMicro: Long, e: Int, epochs: Int): Long =
    math.max(1L, lrMicro * (epochs - e) / epochs)

  /** Round-half-up long division by an arbitrary positive
    * denominator (the lr-scaled gradient steps: multiply by lr FIRST,
    * divide ONCE — dividing the raw gradient by nDocs before the lr
    * multiply truncated every sub-nDocs-micro gradient to zero and
    * froze slow-moving coordinates). */
  private def roundDiv(num: Long, den: Long): Long =
    Math.floorDiv(num + den / 2, den)

  /** One GD step over the shared coef vector — the single code path
    * both the distributed trainer and the sequential reference apply
    * (they cannot drift). grad_E_f = coef_f·w/1e6, grad_w =
    * Σ_f coef_f·E_f/1e6, each scaled by lr/nDocs with ONE rounding. */
  private def applyUpdates(nBuckets: Int, dim: Int, emb: Array[Long],
                           w: Array[Long], coef: Array[Long],
                           lrMicro: Long, nDocs: Long,
                           vEmb: Array[Long], vW: Array[Long]): Unit = {
    val gradW = new Array[Long](dim)
    var f = 0
    while (f < nBuckets) {
      var k = 0
      while (k < dim) {
        val i = f * dim + k
        if (coef(f) != 0L) {
          gradW(k) += rdiv(coef(f) * emb(i))
          // two-stage (micro-rounded gradient, then lr/nDocs scale):
          // lr·coef·w in one product can exceed Long range; the
          // half-micro rounding loss here is 200× finer than the
          // pre-fix floorDiv-by-nDocs truncation
          val gE = rdiv(coef(f) * w(k))
          vEmb(i) = Math.floorDiv(9L * vEmb(i), 10L) +
            roundDiv(lrMicro * gE, 1000000L * nDocs)
        } else {
          vEmb(i) = Math.floorDiv(9L * vEmb(i), 10L)
        }
        emb(i) -= vEmb(i)
        k += 1
      }
      f += 1
    }
    var k = 0
    while (k < dim) {
      vW(k) = Math.floorDiv(9L * vW(k), 10L) +
        roundDiv(lrMicro * gradW(k), 1000000L * nDocs)
      w(k) -= vW(k)
      k += 1
    }
  }

  private def bucketScoresOf(nBuckets: Int, dim: Int, emb: Array[Long],
                             w: Array[Long]): Map[Long, Long] = {
    val m = Map.newBuilder[Long, Long]
    var f = 0
    while (f < nBuckets) {
      var acc = 0L
      var k = 0
      while (k < dim) { acc += w(k) * emb(f * dim + k); k += 1 }
      m += (f.toLong -> rdiv(acc))
      f += 1
    }
    m.result()
  }

  /** Corpus-wide scoring against the FROZEN model: the bilinear
    * classifier collapsed to per-bucket scalars probed by the
    * [[graft.functions.HashedGramScore]] codegen expression — one
    * pure projection (no join, no shuffle, stream-safe). Returns
    * (doc_id, n_grams, z_micro, p_micro, keep); docs with no words
    * are dropped (no grams → no evidence). */
  def scoreFrozen(docs: DataFrame, idCol: String, textCol: String,
                  model: FtModel): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        graft.functions.HashedGramScore.score(col(textCol),
          model.nBuckets, model.bucketScores).as("sc"))
      .filter(col("sc.n_grams") > 0)
      .select(col("doc_id"), col("sc.n_grams").as("n_grams"),
        (expr("sc.score_micros DIV sc.n_grams") +
          model.bMicro).as("z_micro"))
      .withColumn("p_micro",
        expr("CAST(round(1e6 / (1.0 + exp(-(z_micro / 1e6)))) AS BIGINT)"))
      .withColumn("keep", col("z_micro") >= 0L)


  private def ftModelTable(root: String) = s"$root/ft_model"

  /** PERSIST the trained classifier under `root` as ONE atomic
    * VersionedStore table (`ft_model`: part, i, k, v_micro — 'emb'
    * rows carry (bucket, dim-index), 'w' rows the output weights,
    * 'b' the bias, 'meta' the (nBuckets, dim) shape; a single
    * overwrite, so a reader can never see weights from one fit and
    * bias from another — the refreshUnigram one-table contract). */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
                model: FtModel, root: String): Unit = {
    import spark.implicits._
    val rows =
      model.emb.zipWithIndex.map { case (v, i) =>
        ("emb", (i / model.dim).toLong, (i % model.dim).toLong, v)
      }.toSeq ++
      model.w.zipWithIndex.map { case (v, k) =>
        ("w", 0L, k.toLong, v)
      }.toSeq :+
      ("b", 0L, 0L, model.bMicro) :+
      ("meta", model.nBuckets.toLong, model.dim.toLong, 0L)
    graft.offline.VersionedStore.overwrite(
      rows.toDF("part", "i", "k", "v_micro"), ftModelTable(root))
  }

  /** Load the persisted classifier — bit-equal to the [[saveModel]]
    * input (exact long micros; one table, one snapshot pinned for
    * every part). The per-epoch training losses are not persisted
    * (a training-time diagnostic, not a serving artifact). */
  def modelFromStore(spark: org.apache.spark.sql.SparkSession,
                     root: String): FtModel = {
    val t = graft.offline.VersionedStore.read(spark, ftModelTable(root))
      .localCheckpoint(false) // pin ONE snapshot for all four parts
    val meta = t.filter(col("part") === "meta")
      .select("i", "k").head()
    val nBuckets = meta.getLong(0).toInt
    val dim = meta.getLong(1).toInt
    val emb = new Array[Long](nBuckets * dim)
    t.filter(col("part") === "emb").select("i", "k", "v_micro")
      .collect()
      .foreach(r => emb(r.getLong(0).toInt * dim + r.getLong(1).toInt) =
        r.getLong(2))
    val w = new Array[Long](dim)
    t.filter(col("part") === "w").select("k", "v_micro").collect()
      .foreach(r => w(r.getLong(0).toInt) = r.getLong(1))
    val b = t.filter(col("part") === "b").select("v_micro")
      .head().getLong(0)
    FtModel(nBuckets, dim, emb, w, b, Nil)
  }

  // ---------------------------------------------------------------
  // MULTICLASS (softmax) variant — fastText's actual output layer,
  // the langid shape: C classes share the bucket embedding table,
  // each class owns an output vector + bias. Same integer-micro
  // determinism contract as the binary trainer; serving collapses to
  // C per-bucket scalars probed by HashedGramScoreMulti in ONE gram
  // pass.
  // ---------------------------------------------------------------

  /** The trained multiclass artifact: labels sorted ascending (class
    * c = labels(c)), emb row-major (bucket*dim + k), w row-major
    * (class*dim + k), per-class bias — all 1e-6 micros. */
  final case class FtMcModel(nBuckets: Int, dim: Int,
                             labels: Array[String], emb: Array[Long],
                             w: Array[Long], bMicro: Array[Long],
                             lossMicroByEpoch: Seq[Long]) {
    require(emb.length == nBuckets * dim &&
      w.length == labels.length * dim && bMicro.length == labels.length)
    def nClasses: Int = labels.length

    /** Per-bucket per-class scalars s_cf = round(w_c·E_f / 1e6) — the
      * frozen serving artifact (C numbers per bucket). */
    def bucketScoresMc: Map[Long, Array[Long]] =
      FtClassify.bucketScoresMcOf(nBuckets, dim, labels.length, emb, w)
  }

  private[operators] def bucketScoresMcOf(nBuckets: Int, dim: Int,
                                          nC: Int, emb: Array[Long],
                                          w: Array[Long])
  : Map[Long, Array[Long]] = {
    val m = Map.newBuilder[Long, Array[Long]]
    var f = 0
    while (f < nBuckets) {
      val s = new Array[Long](nC)
      var c = 0
      while (c < nC) {
        var acc = 0L
        var k = 0
        while (k < dim) { acc += w(c * dim + k) * emb(f * dim + k); k += 1 }
        s(c) = rdiv(acc)
        c += 1
      }
      m += (f.toLong -> s)
      f += 1
    }
    m.result()
  }

  /** Train the C-class softmax classifier by full-batch GD on `seed`
    * (labelCol is a string class label; classes = distinct labels,
    * sorted). Every corpus-sized reduction is a Spark aggregate;
    * per-row softmax terms are single deterministic double
    * round-trips over exact integer inputs (java.lang.Math — the
    * engine both plans run on), and the update step is the SHARED
    * integer code path of [[trainMcReference]], so the distributed
    * fit is bit-equal to the sequential one (spec-held). */
  def trainMc(seed: DataFrame, idCol: String, textCol: String,
              labelCol: String, nBuckets: Int = 4096, dim: Int = 8,
              epochs: Int = 40, lrMicro: Long = 16000000L,
              seedSalt: Long = 42L, maxClasses: Int = 256): FtMcModel = {
    require(nBuckets > 0 && dim > 0 && epochs >= 1 && lrMicro > 0)
    require(maxClasses >= 2)
    val spark = seed.sparkSession
    import spark.implicits._
    // null-labeled rows are DROPPED, not trained: the when/otherwise
    // index fold would otherwise default them to class 0 and silently
    // corrupt that class's weights (and the sequential reference
    // cannot even represent a null label, so the bit-equal contract
    // would be vacuous for exactly the rows the fold mislabels)
    val labeled = seed.filter(col(labelCol).isNotNull)
    val labels = labeled.select(col(labelCol).cast("string"))
      .distinct().as[String].collect().sorted
    val nC = labels.length
    require(nC >= 2, s"need at least 2 classes, got ${labels.toSeq}")
    // Practical class-count ceiling: the label-index fold and the
    // per-class column set grow O(C); z_c is bound ONCE as a
    // materialized column below (so no expression is O(C^2)), but at
    // hundreds of classes the generated code for one projection still
    // grows toward the JVM's 64KB method limit (an ESTIMATE, not a
    // measured wall — Spark also falls back off codegen gracefully).
    // The default 256 covers fastText's real langid shape (~170
    // languages) with margin; larger label spaces opt in knowingly
    // by raising `maxClasses`.
    require(nC <= maxClasses,
      s"trainMc supports at most $maxClasses classes by default " +
        s"(codegen method-size estimate — raise maxClasses to opt " +
        s"in); got $nC")
    val yCol = labels.zipWithIndex.tail
      .foldLeft(lit(0)) { case (acc, (l, i)) =>
        when(col(labelCol).cast("string") === l, lit(i)).otherwise(acc)
      }
    val feats = Dsir.hashedNgramCounts(
        labeled.select(col(idCol).as("doc_id"), col(textCol).as("text"),
          yCol.as("y")),
        "doc_id", "text", nBuckets, Seq("y" -> col("y")))
      .localCheckpoint(false)
    val docSizes = feats.groupBy("doc_id", "y").agg(sum("cnt").as("m"))
    val pairs = feats.join(docSizes, Seq("doc_id", "y"))
      .select(col("doc_id"), col("y"), col("bucket"), col("cnt"), col("m"))
      .localCheckpoint(false)
    val nDocs = docSizes.count()
    require(nDocs > 0, "empty training seed")

    val emb = Array.tabulate(nBuckets * dim)(i =>
      initMicro(i.toLong, seedSalt, 100000L))
    val w = Array.tabulate(nC * dim)(i =>
      initMicro(nBuckets.toLong * dim + i, seedSalt, 100000L))
    val b = new Array[Long](nC)
    val vEmb = new Array[Long](nBuckets * dim)
    val vW = new Array[Long](nC * dim)
    val vB = new Array[Long](nC)
    val losses = Seq.newBuilder[Long]

    var e = 0
    while (e < epochs) {
      val sRows = bucketScoresMcOf(nBuckets, dim, nC, emb, w).toSeq
        .map { case (f, arr) => (f, arr.toSeq) }
      val sDf = sRows.toDF("bucket", "s_arr")
      val bLits = b.clone()
      // forward: per-class weighted score sums, then the softmax
      // round-trip per row (exact integer inputs → one double chain)
      val sumCols = (0 until nC).map(c =>
        sum(col("cnt") * element_at(col("s_arr"), c + 1)).as(s"ss$c"))
      // z_c is bound ONCE as a materialized column and referenced by
      // name everywhere after (mx, se, p_c, the loss CASE) — the
      // expression text stays O(C), not O(C^2) as it would if each
      // z inlined into every consumer (at ~100+ classes the inlined
      // form's expression tree hits codegen method-size limits).
      // Same double chain, same deterministic value.
      var perDoc = pairs.join(broadcast(sDf), Seq("bucket"))
        .groupBy("doc_id", "y", "m")
        .agg(sumCols.head,
          (sumCols.tail :+
            collect_list(struct(col("bucket"), col("cnt"))).as("fs")): _*)
      (0 until nC).foreach { c =>
        perDoc = perDoc.withColumn(s"z$c",
          expr(s"((ss$c / m + ${bLits(c)}) / 1e6)"))
      }
      perDoc = perDoc
        .withColumn("mx",
          greatest((0 until nC).map(c => col(s"z$c")): _*))
        .withColumn("se", (0 until nC).map(c =>
          exp(col(s"z$c") - col("mx"))).reduce(_ + _))
      (0 until nC).foreach { c =>
        perDoc = perDoc.withColumn(s"p$c", expr(
            s"CAST(round(1e6 * exp(z$c - mx) / se) AS BIGINT)"))
          .withColumn(s"err$c",
            col(s"p$c") - when(col("y") === c, 1000000L).otherwise(0L))
      }
      val pyExpr = (0 until nC).map(c =>
        s"WHEN y = $c THEN p$c").mkString("CASE ", " ", " END")
      perDoc = perDoc.localCheckpoint(false)
      val aggs = perDoc.agg(
          sum(expr(s"""CAST(round(-1e6 * ln(greatest($pyExpr, 1) / 1e6))
                AS BIGINT)""")).as("loss_sum"),
          (0 until nC).map(c => sum(col(s"err$c")).as(s"es$c")): _*)
        .head()
      losses += Math.floorDiv(aggs.getLong(0), nDocs)
      val errSums = (0 until nC).map(c => aggs.getLong(1 + c)).toArray
      // backward: per-(bucket, class) coefficients in one reduce
      val coefCols = (0 until nC).map(c =>
        sum(expr(s"CAST(round(CAST(err$c AS DOUBLE) * f.cnt / m) AS BIGINT)"))
          .as(s"c$c"))
      val coefRows = perDoc
        .select((col("m") +: (0 until nC).map(c => col(s"err$c"))) :+
          explode(col("fs")).as("f"): _*)
        .groupBy(col("f.bucket").as("bucket"))
        .agg(coefCols.head, coefCols.tail: _*)
        .collect()
      val coef = Array.fill(nC)(new Array[Long](nBuckets))
      coefRows.foreach { r =>
        val f = r.getLong(0).toInt
        var c = 0
        while (c < nC) { coef(c)(f) = r.getLong(1 + c); c += 1 }
      }
      val lrE = decayedLr(lrMicro, e, epochs)
      applyUpdatesMc(nBuckets, dim, nC, emb, w, b, coef, errSums, lrE,
        nDocs, vEmb, vW, vB)
      e += 1
    }
    FtMcModel(nBuckets, dim, labels, emb, w, b, losses.result())
  }

  /** One multiclass GD step — THE shared code path of the
    * distributed and sequential fits. grad_E_f(k) = rdiv(Σ_c
    * coef_cf·w_ck) (one rounding of the class-summed product),
    * grad_w_ck = Σ_f rdiv(coef_cf·E_fk), biases from the error sums;
    * momentum β=0.9 and the two-stage lr/nDocs scaling exactly as
    * the binary [[applyUpdates]]. */
  private def applyUpdatesMc(nBuckets: Int, dim: Int, nC: Int,
                             emb: Array[Long], w: Array[Long],
                             b: Array[Long], coef: Array[Array[Long]],
                             errSums: Array[Long], lrMicro: Long,
                             nDocs: Long, vEmb: Array[Long],
                             vW: Array[Long], vB: Array[Long]): Unit = {
    val gradW = new Array[Long](nC * dim)
    var f = 0
    while (f < nBuckets) {
      var any = false
      var c = 0
      while (c < nC && !any) { any = coef(c)(f) != 0L; c += 1 }
      var k = 0
      while (k < dim) {
        val i = f * dim + k
        if (any) {
          var accE = 0L
          c = 0
          while (c < nC) {
            val cf = coef(c)(f)
            if (cf != 0L) {
              gradW(c * dim + k) += rdiv(cf * emb(i))
              accE += cf * w(c * dim + k)
            }
            c += 1
          }
          vEmb(i) = Math.floorDiv(9L * vEmb(i), 10L) +
            roundDiv(lrMicro * rdiv(accE), 1000000L * nDocs)
        } else {
          vEmb(i) = Math.floorDiv(9L * vEmb(i), 10L)
        }
        emb(i) -= vEmb(i)
        k += 1
      }
      f += 1
    }
    var c = 0
    while (c < nC) {
      var k = 0
      while (k < dim) {
        val i = c * dim + k
        vW(i) = Math.floorDiv(9L * vW(i), 10L) +
          roundDiv(lrMicro * gradW(i), 1000000L * nDocs)
        w(i) -= vW(i)
        k += 1
      }
      vB(c) = Math.floorDiv(9L * vB(c), 10L) +
        roundDiv(lrMicro * errSums(c), 1000000L * nDocs)
      b(c) -= vB(c)
      c += 1
    }
  }

  /** Corpus-wide multiclass scoring against the FROZEN model: C
    * per-bucket scalars probed by [[graft.functions
    * .HashedGramScoreMulti]] in ONE gram pass — a pure projection
    * (no join, no shuffle, stream-safe). Returns (doc_id, n_grams,
    * z_micro array, pred_idx, pred_label); argmax ties break to the
    * LOWEST class index (deterministic). Docs with no words drop. */
  def scoreFrozenMc(docs: DataFrame, idCol: String, textCol: String,
                    model: FtMcModel): DataFrame = {
    val nC = model.nClasses
    val labelArr = array(model.labels.map(lit(_)): _*)
    docs.select(col(idCol).as("doc_id"),
        graft.functions.HashedGramScore.scoreMulti(col(textCol),
          model.nBuckets, nC, model.bucketScoresMc).as("sc"))
      .filter(col("sc.n_grams") > 0)
      .select(col("doc_id"), col("sc.n_grams").as("n_grams"),
        expr((0 until nC).map(c =>
            s"element_at(sc.score_micros, ${c + 1}) DIV sc.n_grams" +
              s" + ${model.bMicro(c)}")
          .mkString("array(", ", ", ")")).as("z_micro"))
      // argmax, ties to the lowest index: array_position finds the
      // FIRST occurrence of the max
      .withColumn("pred_idx",
        (array_position(col("z_micro"), array_max(col("z_micro"))) - 1)
          .cast("int"))
      .withColumn("pred_label",
        element_at(labelArr, col("pred_idx") + 1))
  }

  private def ftMcTable(root: String) = s"$root/ft_mc_model"

  /** PERSIST the multiclass classifier under `root` as ONE atomic
    * VersionedStore table (`ft_mc_model`: part, i, k, v_micro, s —
    * 'emb' rows (bucket, dim-index), 'w' rows (class, dim-index),
    * 'b' rows (class), 'label' rows carry the class string in `s`,
    * 'meta' the (nBuckets, dim) shape; one overwrite, the
    * [[saveModel]] contract). */
  def saveModelMc(spark: org.apache.spark.sql.SparkSession,
                  model: FtMcModel, root: String): Unit = {
    import spark.implicits._
    val none: Option[String] = None
    val rows =
      model.emb.zipWithIndex.map { case (v, i) =>
        ("emb", (i / model.dim).toLong, (i % model.dim).toLong, v, none)
      }.toSeq ++
      model.w.zipWithIndex.map { case (v, i) =>
        ("w", (i / model.dim).toLong, (i % model.dim).toLong, v, none)
      }.toSeq ++
      model.bMicro.zipWithIndex.map { case (v, c) =>
        ("b", c.toLong, 0L, v, none)
      }.toSeq ++
      model.labels.zipWithIndex.map { case (l, c) =>
        ("label", c.toLong, 0L, 0L, Some(l))
      }.toSeq :+
      ("meta", model.nBuckets.toLong, model.dim.toLong, 0L, none)
    graft.offline.VersionedStore.overwrite(
      rows.toDF("part", "i", "k", "v_micro", "s"), ftMcTable(root))
  }

  /** Load the persisted multiclass classifier — bit-equal to the
    * [[saveModelMc]] input (per-epoch losses are a training-time
    * diagnostic, not persisted). */
  def modelMcFromStore(spark: org.apache.spark.sql.SparkSession,
                       root: String): FtMcModel = {
    val t = graft.offline.VersionedStore.read(spark, ftMcTable(root))
      .localCheckpoint(false) // pin ONE snapshot for all five parts
    val meta = t.filter(col("part") === "meta").select("i", "k").head()
    val nBuckets = meta.getLong(0).toInt
    val dim = meta.getLong(1).toInt
    val labels = t.filter(col("part") === "label")
      .select("i", "s").collect()
      .sortBy(_.getLong(0)).map(_.getString(1))
    val nC = labels.length
    val emb = new Array[Long](nBuckets * dim)
    t.filter(col("part") === "emb").select("i", "k", "v_micro").collect()
      .foreach(r => emb(r.getLong(0).toInt * dim + r.getLong(1).toInt) =
        r.getLong(2))
    val w = new Array[Long](nC * dim)
    t.filter(col("part") === "w").select("i", "k", "v_micro").collect()
      .foreach(r => w(r.getLong(0).toInt * dim + r.getLong(1).toInt) =
        r.getLong(2))
    val b = new Array[Long](nC)
    t.filter(col("part") === "b").select("i", "v_micro").collect()
      .foreach(r => b(r.getLong(0).toInt) = r.getLong(1))
    FtMcModel(nBuckets, dim, labels, emb, w, b, Nil)
  }

  private def ftSeedTable(root: String) = s"$root/ft_mc_seed"
  private def ftParamsTable(root: String) = s"$root/ft_mc_params"
  private def ftMassTable(root: String) = s"$root/ft_mc_trained_mass"

  /** The per-(bucket, label) hashed-gram mass of a labeled seed —
    * the training-data distribution through the EXACT feature path
    * [[trainMc]] consumes (so drift measures what the fit would
    * actually see). Label keyed as a STRING: class indices are
    * derived from sorted distinct labels and shift when a new class
    * arrives, strings don't. */
  private def seedBucketMass(seed: DataFrame, idCol: String,
                             textCol: String, labelCol: String,
                             nBuckets: Int): DataFrame =
    Dsir.hashedNgramCounts(
        seed.filter(col(labelCol).isNotNull)
          .select(col(idCol).as("doc_id"), col(textCol).as("text"),
            col(labelCol).cast("string").as("label")),
        "doc_id", "text", nBuckets, Seq("label" -> col("label")))
      .groupBy("bucket", "label").agg(sum("cnt").as("cnt"))

  /** Bootstrap the INCREMENTAL-REFRESH store for the multiclass
    * classifier (the Bpe.refreshVocab precedent): persists the seed
    * docs (the model's training set — seed-sized, not corpus-sized),
    * the training params, the fitted model, and the trained-on
    * (bucket, label) mass snapshot [[seedDriftMc]] measures against.
    * Returns the fitted model. */
  def initRefreshStoreMc(seed: DataFrame, idCol: String,
                         textCol: String, labelCol: String,
                         root: String, nBuckets: Int = 4096,
                         dim: Int = 8, epochs: Int = 40,
                         lrMicro: Long = 16000000L,
                         seedSalt: Long = 42L): FtMcModel = {
    import graft.offline.VersionedStore
    val spark = seed.sparkSession
    import spark.implicits._
    VersionedStore.overwrite(
      seedRows(seed, idCol, textCol, labelCol), ftSeedTable(root))
    VersionedStore.overwrite(
      Seq((nBuckets.toLong, dim.toLong, epochs.toLong, lrMicro,
        seedSalt)).toDF("n_buckets", "dim", "epochs", "lr_micro",
        "seed_salt"), ftParamsTable(root))
    retrainMcFromStore(spark, root)
  }

  /** Fold one labeled shard into the seed store — a copy-on-write
    * keyed MERGE on doc_id (idempotent: replaying a shard rewrites
    * the same rows to the same values, so no ledger is needed).
    * Returns the seed row count after the merge. The model is NOT
    * retrained here — call [[refreshMc]] on whatever cadence suits. */
  def upsertSeedDocsMc(shardDocs: DataFrame, idCol: String,
                       textCol: String, labelCol: String,
                       root: String): Long = {
    import graft.offline.VersionedStore
    val spark = shardDocs.sparkSession
    VersionedStore.merge(seedRows(shardDocs, idCol, textCol, labelCol),
      ftSeedTable(root), Seq("doc_id"))
    VersionedStore.read(spark, ftSeedTable(root)).count()
  }

  /** The one seed-row projection both store writers share: the id
    * keeps its ORIGINAL type (string ids are first-class — a cast
    * would null them, breaking merge idempotence and collapsing the
    * fit); a NULL id fails loudly in-plan rather than corrupting the
    * keyed merge. */
  private def seedRows(docs: DataFrame, idCol: String, textCol: String,
                       labelCol: String): DataFrame =
    docs.filter(col(labelCol).isNotNull)
      .select(when(col(idCol).isNotNull, col(idCol)).otherwise(expr(
          "raise_error('ft seed store: doc ids must be non-null')"))
          .as("doc_id"),
        col(textCol).as("text"),
        col(labelCol).cast("string").as("label"))

  /** Bucket-mass drift between the CURRENT seed distribution and the
    * distribution the stored model was trained on: L1 over the
    * (bucket, label) union normalized by the current total mass —
    * new classes and vanished classes count fully. 0 right after
    * (re)training. */
  def seedDriftMc(spark: org.apache.spark.sql.SparkSession,
                  root: String): Double = {
    import graft.offline.VersionedStore
    val p = VersionedStore.read(spark, ftParamsTable(root)).head()
    val nBuckets = p.getLong(0).toInt
    val cur = seedBucketMass(VersionedStore.read(spark, ftSeedTable(root)),
        "doc_id", "text", "label", nBuckets)
      .select(col("bucket"), col("label"), col("cnt").as("c_now"))
    val trained = VersionedStore.read(spark, ftMassTable(root))
      .select(col("bucket"), col("label"), col("cnt").as("c_train"))
    val r = cur.join(trained, Seq("bucket", "label"), "full_outer")
      .agg(
        sum(abs(coalesce(col("c_now"), lit(0L)) -
          coalesce(col("c_train"), lit(0L)))).as("l1"),
        sum(coalesce(col("c_now"), lit(0L))).as("mass"))
      .head()
    if (r.isNullAt(1) || r.getLong(1) == 0L) 0.0
    else r.getLong(0).toDouble / r.getLong(1)
  }

  final case class McRefresh(drift: Double, retrained: Boolean,
                             model: FtMcModel)

  /** Retrain-vs-keep: measure [[seedDriftMc]]; above `maxDrift`,
    * refit from the STORED seed with the STORED params (deterministic
    * — the refit of an unchanged seed is bit-equal to the stored
    * model, which is why serving through the keep branch is sound)
    * and re-persist model + mass snapshot atomically; otherwise keep
    * serving the current model. Old versions stay readable
    * (copy-on-write), so in-flight scoring is unaffected. */
  def refreshMc(spark: org.apache.spark.sql.SparkSession, root: String,
                maxDrift: Double = 0.1): McRefresh = {
    val drift = seedDriftMc(spark, root)
    if (drift > maxDrift)
      McRefresh(drift, retrained = true, retrainMcFromStore(spark, root))
    else
      McRefresh(drift, retrained = false, modelMcFromStore(spark, root))
  }

  private def retrainMcFromStore(spark: org.apache.spark.sql.SparkSession,
                                 root: String): FtMcModel = {
    import graft.offline.VersionedStore
    val p = VersionedStore.read(spark, ftParamsTable(root)).head()
    val (nBuckets, dim, epochs, lrMicro, seedSalt) =
      (p.getLong(0).toInt, p.getLong(1).toInt, p.getLong(2).toInt,
        p.getLong(3), p.getLong(4))
    val seed = VersionedStore.read(spark, ftSeedTable(root))
    val model = trainMc(seed, "doc_id", "text", "label", nBuckets, dim,
      epochs, lrMicro, seedSalt)
    saveModelMc(spark, model, root)
    VersionedStore.overwrite(
      seedBucketMass(seed, "doc_id", "text", "label", nBuckets),
      ftMassTable(root))
    model
  }

  /** Sequential in-memory multiclass reference — the spec twin of
    * [[trainMc]]: same features, same double round-trips
    * (java.lang.Math), same shared [[applyUpdatesMc]] step. rows =
    * (doc_id, y, Seq(bucket -> cnt)). */
  private[graft] def trainMcReference(
      rows: Seq[(Long, Int, Seq[(Long, Long)])], labels: Array[String],
      nBuckets: Int, dim: Int, epochs: Int, lrMicro: Long,
      seedSalt: Long): FtMcModel = {
    val nC = labels.length
    val emb = Array.tabulate(nBuckets * dim)(i =>
      initMicro(i.toLong, seedSalt, 100000L))
    val w = Array.tabulate(nC * dim)(i =>
      initMicro(nBuckets.toLong * dim + i, seedSalt, 100000L))
    val b = new Array[Long](nC)
    val vEmb = new Array[Long](nBuckets * dim)
    val vW = new Array[Long](nC * dim)
    val vB = new Array[Long](nC)
    val nDocs = rows.size.toLong
    val losses = Seq.newBuilder[Long]
    var e = 0
    while (e < epochs) {
      val s = bucketScoresMcOf(nBuckets, dim, nC, emb, w)
      val coef = Array.fill(nC)(new Array[Long](nBuckets))
      val errSums = new Array[Long](nC)
      var lossSum = 0L
      rows.foreach { case (_, y, fs) =>
        val m = fs.map(_._2).sum
        val z = Array.tabulate(nC) { c =>
          val sumS = fs.map { case (f, cnt) => cnt * s(f)(c) }.sum
          (sumS.toDouble / m + b(c)) / 1e6
        }
        val mx = z.max
        val es = z.map(zc => math.exp(zc - mx))
        val se = es.foldLeft(0.0)(_ + _)
        val p = es.map(ec => math.round(1e6 * ec / se))
        var c = 0
        while (c < nC) {
          val err = p(c) - (if (y == c) 1000000L else 0L)
          errSums(c) += err
          fs.foreach { case (f, cnt) =>
            coef(c)(f.toInt) += sqlRound(err.toDouble * cnt / m)
          }
          c += 1
        }
        lossSum += math.round(-1e6 * math.log(math.max(p(y), 1L) / 1e6))
      }
      losses += Math.floorDiv(lossSum, nDocs)
      val lrE = decayedLr(lrMicro, e, epochs)
      applyUpdatesMc(nBuckets, dim, nC, emb, w, b, coef, errSums, lrE,
        nDocs, vEmb, vW, vB)
      e += 1
    }
    FtMcModel(nBuckets, dim, labels, emb, w, b, losses.result())
  }

  /** Sequential in-memory reference trainer — the spec twin: same
    * features, same integer ops, same rounding, plain Scala loops.
    * Exists so [[train]]'s distributed aggregates can be held
    * bit-equal to a fit with no Spark in it. */
  private[graft] def trainReference(rows: Seq[(Long, Boolean, Seq[(Long, Long)])],
                                    nBuckets: Int, dim: Int,
                                    epochs: Int, lrMicro: Long,
                                    seedSalt: Long): FtModel = {
    val emb = Array.tabulate(nBuckets * dim)(i =>
      initMicro(i.toLong, seedSalt, 100000L))
    val w = Array.tabulate(dim)(k =>
      initMicro(nBuckets.toLong * dim + k, seedSalt, 100000L))
    var b = 0L
    val vEmb = new Array[Long](nBuckets * dim)
    val vW = new Array[Long](dim)
    var vB = 0L
    val nDocs = rows.size.toLong
    val losses = Seq.newBuilder[Long]
    var e = 0
    while (e < epochs) {
      val s = bucketScoresOf(nBuckets, dim, emb, w)
      val coef = new Array[Long](nBuckets)
      var errSum = 0L
      var lossSum = 0L
      rows.foreach { case (_, y, fs) =>
        val m = fs.map(_._2).sum
        val sumS = fs.map { case (f, c) => c * s(f) }.sum
        // double division like the SQL plan's `sum_s / m`
        val z = sumS.toDouble / m + b
        val p = math.round(1e6 / (1.0 + math.exp(-(z / 1e6))))
        val err = p - (if (y) 1000000L else 0L)
        errSum += err
        lossSum += math.round(-1e6 * math.log(
          (if (y) math.max(p, 1L) else math.max(1000000L - p, 1L)) / 1e6))
        fs.foreach { case (f, c) =>
          coef(f.toInt) += sqlRound(err.toDouble * c / m)
        }
      }
      losses += Math.floorDiv(lossSum, nDocs)
      val lrE = decayedLr(lrMicro, e, epochs)
      applyUpdates(nBuckets, dim, emb, w, coef, lrE, nDocs, vEmb, vW)
      vB = Math.floorDiv(9L * vB, 10L) +
        roundDiv(lrE * errSum, 1000000L * nDocs)
      b -= vB
      e += 1
    }
    FtModel(nBuckets, dim, emb, w, b, losses.result())
  }
}
