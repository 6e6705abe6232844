package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Byte-pair-encoding tokenizer TRAINING at corpus scale (Sennrich et
  * al. 2016, the GPT-2/SentencePiece vocabulary algorithm), plus the
  * matching encoder. The piece an LLM data engine usually shells out
  * for — here it runs where the corpus lives.
  *
  * Scale shape — the part that matters at 100 TB: the corpus is read
  * ONCE, into a (word, count) table; training then iterates over that
  * WORD table (vocabulary-sized, Heaps'-law sublinear in the corpus),
  * never the corpus. Each merge round is one pair-count aggregate +
  * one argmax collect (a single driver row) + one higher-order-fold
  * transform, with the state localCheckpoint'ed per round to cut the
  * iteration lineage (the [[Dedup.clusters]] pattern). Word-internal
  * merges only (the standard word-boundary BPE); pair counts count
  * every adjacent position. Ties break deterministically: highest
  * count, then (left, right) in UTF-8 BINARY order — Spark's string
  * comparison, which is code-point order and differs from Java's
  * UTF-16 compareTo only on ties involving non-BMP characters (the
  * spec's naive reference compares UTF-8 bytes for exactly this
  * reason) — so training is reproducible across partitionings and
  * matches the reference implementation exactly.
  */
object Bpe {

  /** One merged training state: ordered merge rules and the final
    * per-word segmentation (the encode lookup table). */
  final case class BpeModel(rules: DataFrame, wordPieces: DataFrame)

  /** `word` column → single-character symbol array — the untrained
    * baseline, shared by the initial training state and encode's OOV
    * fallback so the two can never diverge. "Character" here means
    * CODE POINT (Spark's substring/length are code-point indexed), so
    * a non-BMP character is ONE initial symbol — unlike a Java
    * `String#charAt` split, which would yield its two surrogate
    * halves (the spec's naive reference iterates code points for
    * exactly this parity). */
  private val charSymsExpr =
    "transform(sequence(1, length(word)), i -> substring(word, i, 1))"

  /** Initial state: distinct corpus words with counts, split into
    * single-character symbols. */
  private def initState(docs: DataFrame, idCol: String, textCol: String)
  : DataFrame =
    docs.select(explode(Fns.words(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", expr(charSymsExpr))

  /** Greedy left-to-right non-overlapping application of ONE merge
    * rule (l, r) -> l||r to a symbol array, as a higher-order fold:
    * append each symbol unless the accumulator ends with `l` and the
    * symbol is `r`, in which case the tail is replaced by the merged
    * token. The merged token is a different string than `l`, so a
    * run like "aaa" under (a,a) folds to [aa, a] — exactly the
    * greedy scan. */
  private def applyMerge(syms: org.apache.spark.sql.Column, l: String,
                         r: String): org.apache.spark.sql.Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))

  /** Train up to `nMerges` merge rules. Stops early when no adjacent
    * pair reaches `minPairCount` occurrences. Returns the ordered
    * rule table (rank, left, right, merged, pair_count) and the final
    * word segmentation — both small (rule-count- and vocabulary-
    * sized). */
  def train(docs: DataFrame, idCol: String, textCol: String,
            nMerges: Int, minPairCount: Long = 2L): BpeModel = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    require(minPairCount >= 1, s"minPairCount must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    var state = initState(docs, idCol, textCol).localCheckpoint()
    val rules = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      // size guard: sequence(0, -1) DESCENDS in Spark, so a fully
      // merged single-symbol word would index syms[-1]
      val best = state
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS l, syms[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("pc"))
        .filter(col("pc") >= minPairCount)
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, pc) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        rules += ((round + 1, l, r, l + r, pc))
        // no unpersist: localCheckpoint blocks aren't CacheManager
        // entries, the ContextCleaner frees prior rounds' RDDs on GC
        // (the Dedup.clusters convention)
        state = state.withColumn("syms",
          applyMerge(col("syms"), l, r)).localCheckpoint()
        round += 1
      }
    }
    BpeModel(
      rules.toSeq.toDF("rank", "left", "right", "merged", "pair_count"),
      state.select("word", "cnt", "syms"))
  }

  /** Greedy left-to-right application of a WHOLE BATCH of
    * non-interacting merge rules in one fold pass. Rules are keyed by
    * a two-level map literal `left -> (right -> merged)` (no string
    * concatenation, so corpus symbols can contain any separator).
    * The caller guarantees no rule's RIGHT symbol equals another
    * rule's LEFT symbol (and no merged string collides with a live
    * symbol), which makes simultaneous application equal to
    * sequential application in rank order: no merge can enable or
    * disable another rule's match, and each adjacency matches at most
    * one rule (shared lefts disambiguate by the next symbol, shared
    * rights by the previous). */
  private def applyMergeBatch(syms: org.apache.spark.sql.Column,
                              rules: Seq[(String, String, String)])
  : org.apache.spark.sql.Column = {
    val byL = rules.groupBy(_._1)
    val ruleMap = map(byL.toSeq.flatMap { case (l, rs) =>
      Seq(lit(l), map(rs.flatMap(t => Seq(lit(t._2), lit(t._3))): _*))
    }: _*)
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => {
        val hit = try_element_at(
          try_element_at(ruleMap, element_at(acc, -1)), s)
        // when-chain, not &&: branches evaluate lazily, so the
        // element_at(acc, -1) lookup never runs on an empty array
        when(size(acc) === 0, array(s))
          .when(hit.isNotNull,
            concat(slice(acc, lit(1), size(acc) - 1), array(hit)))
          .otherwise(concat(acc, array(s)))
      })
  }

  /** Batched BPE training — EXACTLY equal to [[train]] (same rules,
    * same ranks, same segmentations; spec-held to the same naive
    * reference) but applying up to `maxBatch` merges per round, so a
    * 32k-vocabulary tokenizer costs hundreds of Spark jobs instead of
    * 64k. [[train]]'s per-merge 2-job floor (~0.13 s/merge of pure
    * scheduling measured on this box) makes real vocabularies hours
    * of driver time regardless of corpus size; this is the fix.
    *
    * Why batching can be exact: after applying a merge (a,b)→ab,
    *  - a pair (x,y) with x ≠ b and y ≠ a keeps its exact count —
    *    fusing a·b consumes an x only when x == b (pattern "a b y")
    *    and a y only when y == a (pattern "x a b"); merely sharing
    *    the left symbol (x == a) or right symbol (y == b) changes
    *    nothing — and
    *  - every NEWLY CREATED pair contains the token ab, and each of
    *    its occurrences sits on a pre-merge trigram "x a b" or
    *    "a b y" — so its count is bounded by the max pre-round
    *    trigram count through (a,b). (This also covers pairs of two
    *    merged tokens: an "ab·cd" occurrence sits on the pre-round
    *    trigram "b c d" of the (c,d) rule.)
    * So the round computes pair counts AND per-pair created-pair
    * bounds (one extra trigram aggregate over the vocabulary-sized
    * word table), sorts candidates by the sequential order
    * (count desc, then left, right in binary order) and accepts a
    * PREFIX while each candidate (1) does not interact with an
    * already-accepted rule (its left is no accepted rule's right and
    * vice versa) — its count is then provably what the sequential
    * argmax would see — and (2) has count STRICTLY above
    * every accepted rule's created-pair bound — so no pair created
    * mid-batch can outrank it (ties stop the batch: a created pair
    * could tie-break-win). The first rejection ends the batch (a
    * conflicting candidate's decayed count is unknown, so nothing
    * after it is provably next). Worst case the prefix is a single
    * pair — plain sequential training, still exact.
    *
    * Returns the model plus the round count (the probe's evidence
    * that batching actually batched).
    */
  def trainBatched(docs: DataFrame, idCol: String, textCol: String,
                   nMerges: Int, minPairCount: Long = 2L,
                   maxBatch: Int = 128): (BpeModel, Int) = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    require(minPairCount >= 1, s"minPairCount must be >= 1")
    require(maxBatch >= 1, s"maxBatch must be >= 1, got $maxBatch")
    val spark = docs.sparkSession
    import spark.implicits._
    var state = initState(docs, idCol, textCol).localCheckpoint()
    val rules = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var rounds = 0
    var done = false
    while (rules.size < nMerges && !done) {
      val pairs = state
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS l, syms[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("pc"))
        .filter(col("pc") >= minPairCount)
      val tris = state
        .filter(size(col("syms")) >= 3)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(syms) - 3), " +
            "i -> struct(syms[i] AS s1, syms[i+1] AS s2, syms[i+2] AS s3))"))
          .as("t"))
        .groupBy(col("t.s1").as("s1"), col("t.s2").as("s2"),
          col("t.s3").as("s3"))
        .agg(sum("cnt").as("tc"))
      // created (x, ab) pairs sit on trigrams (*, a, b); created
      // (ab, y) pairs on (a, b, *) — bound each rule by the max
      val cRight = tris.groupBy(col("s2").as("l"), col("s3").as("r"))
        .agg(max("tc").as("cr"))
      val cLeft = tris.groupBy(col("s1").as("l"), col("s2").as("r"))
        .agg(max("tc").as("cl"))
      // merged-string collision guard: if concat(l, r) ALREADY exists
      // as a symbol with adjacencies (it appears in the pair table),
      // applying the merge ADDS instances to pre-existing pairs named
      // with that symbol — their counts can rise above later
      // candidates', which the disjoint-pairs-keep-their-counts
      // invariant doesn't cover. Possible once merges produce
      // multi-char symbols (e.g. (b,c)→bc early, later (a,bc) merges
      // to "abc" while "abc" was already created via (ab,c)). A
      // flagged rule is still safely ACCEPTED (gains materialize only
      // after its application) but must END its round.
      val symbols = pairs.select(explode(array(col("l"), col("r")))
        .as("sym")).distinct()
      val want = math.min(maxBatch, nMerges - rules.size)
      val cand = pairs
        .join(cRight, Seq("l", "r"), "left")
        .join(cLeft, Seq("l", "r"), "left")
        .withColumn("cb", least(col("pc"),
          greatest(coalesce(col("cr"), lit(0L)),
            coalesce(col("cl"), lit(0L)))))
        .join(symbols.withColumn("collides", lit(true)),
          concat(col("l"), col("r")) === col("sym"), "left")
        .withColumn("collides", coalesce(col("collides"), lit(false)))
        .select("l", "r", "pc", "cb", "collides")
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(want)
        .collect()
      if (cand.isEmpty) done = true
      else {
        // a candidate (x, y) INTERACTS with an accepted rule (a, b)
        // only when x == b ("a b y": the merge consumes the b, so
        // (x, y) occurrences decay) or y == a ("x a b": consumes the
        // a). Sharing the LEFT symbol (x == a) or the RIGHT symbol
        // (y == b) changes nothing: an a is consumed only when
        // followed by b, a b only when preceded by a — so counts
        // stay exact AND the one-pass combined-map application stays
        // equal to sequential (no rule's right equals another's left
        // ⇒ no merge enables or disables another's match).
        val lefts = scala.collection.mutable.Set.empty[String]
        val rights = scala.collection.mutable.Set.empty[String]
        val batch = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, String)]
        var maxCb = Long.MinValue
        var stop = false
        var i = 0
        while (i < cand.length && !stop) {
          val (l, r, pc, cb, collides) = (cand(i).getString(0),
            cand(i).getString(1), cand(i).getLong(2), cand(i).getLong(3),
            cand(i).getBoolean(4))
          if (batch.nonEmpty && (rights(l) || lefts(r) || pc <= maxCb)) {
            if (sys.env.contains("GRAFT_BPE_DEBUG")) {
              val why = if (rights(l) || lefts(r)) "conflict" else "cbound"
              println(s"[bpe] round stop: $why at batch=${batch.size} " +
                s"cand=($l,$r,pc=$pc) maxCb=$maxCb")
            }
            stop = true
          }
          else {
            rules += ((rules.size + 1, l, r, l + r, pc))
            batch += ((l, r, l + r))
            lefts += l; rights += r
            maxCb = math.max(maxCb, cb)
            if (collides) stop = true
          }
          i += 1
        }
        state = state.withColumn("syms",
          applyMergeBatch(col("syms"), batch.toSeq)).localCheckpoint()
        rounds += 1
      }
    }
    (BpeModel(
      rules.toSeq.toDF("rank", "left", "right", "merged", "pair_count"),
      state.select("word", "cnt", "syms")), rounds)
  }

  /** Encode a corpus with a trained model: each word joins the final
    * segmentation table (BPE is deterministic per word, so the
    * training state IS the encoder — the standard piece-cache trick;
    * no per-rule loop at encode time). Out-of-vocabulary words fall
    * back to single characters, the untrained-symbol baseline.
    * Output: one row per (doc, word position) with the piece array —
    * explode or flatten downstream as needed.
    *
    * Scale shape: one corpus tokenize + one equi-join against the
    * vocabulary-sized piece table (AQE broadcasts it when small);
    * the corpus never shuffles.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             model: BpeModel): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
        posexplode(Fns.words(col(textCol))).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
    words.join(model.wordPieces.select(col("word"), col("syms")),
        Seq("word"), "left")
      .withColumn("pieces", coalesce(col("syms"), expr(charSymsExpr)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("word"), col("pieces"))
  }
}
