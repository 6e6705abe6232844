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
    * fallback so the two can never diverge. */
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
