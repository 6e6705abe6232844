package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass scorer for a FROZEN linear bag-of-hashed-ngrams model:
  * text → (n_grams, score in 1e-6 units), where each unigram and
  * bigram of the single-space tokenization contributes the frozen
  * per-bucket value of its md5 hash bucket (absent buckets contribute
  * zero — an unseen gram is neutral by design).
  *
  * This is the streaming-safe form of [[graft.operators.Dsir]]
  * importance scoring — the model (≤ nBuckets entries of micro-scaled
  * log ratios) freezes offline like the CCNet vocabulary or the eval
  * shingle set, and each document is scored in one projection: no
  * explode, no join, no shuffle, exact integer arithmetic (micros sum
  * in a long, so the result is order-independent and bit-equal to the
  * batch path's decimal dot product after the single final division).
  *
  * Hashing matches the batch path EXACTLY: bucket =
  * (first-8-hex-chars of md5(gram) as unsigned) % 2^31 % nBuckets —
  * the same `conv(substring(md5(g),1,8),16,10) % 2^31` every md5
  * sampler in this engine uses — computed here straight from the
  * gram's UTF-8 bytes (a space can never occur inside a multi-byte
  * UTF-8 sequence, so byte-level word splitting is exact). Empty
  * words (consecutive spaces) are dropped before bigram formation,
  * matching `filter(split(text,' '), w -> w <> '')`.
  */
case class HashedGramScore(child: Expression, nBuckets: Int,
                           buckets: Array[Long], microsVals: Array[Long])
  extends UnaryExpression with ExpectsInputTypes {

  require(nBuckets > 0 && buckets.length == microsVals.length)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("score_micros", LongType, nullable = false)))
  override def prettyName: String = "graft_hashed_gram_score"

  @transient private lazy val model: java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](buckets.length * 2)
    var i = 0
    while (i < buckets.length) { m.put(buckets(i), microsVals(i)); i += 1 }
    m
  }

  def compute(s: UTF8String): InternalRow = {
    var nGrams = 0L
    var micros = 0L
    HashedGramScore.foreachBucket(s, nBuckets) { b =>
      nGrams += 1
      val v = model.get(b)
      if (v != null) micros += v
    }
    InternalRow(nGrams, micros)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramScorer", this,
      classOf[HashedGramScore].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : HashedGramScore = copy(child = newChild)
}

/** The C-class twin of [[HashedGramScore]]: ONE gram pass accumulates
  * C frozen per-bucket scores simultaneously (text → (n_grams,
  * array of C micro sums)) — the serving shape of a frozen MULTICLASS
  * linear bag-of-hashed-ngrams model (fastText-style langid /
  * multi-way quality tiers). Same md5 bucket math, same
  * absent-bucket-is-neutral contract, exact long accumulation per
  * class.
  */
case class HashedGramScoreMulti(child: Expression, nBuckets: Int,
                                nClasses: Int, buckets: Array[Long],
                                microsFlat: Array[Long])
  extends UnaryExpression with ExpectsInputTypes {

  require(nBuckets > 0 && nClasses > 0 &&
    microsFlat.length == buckets.length * nClasses)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("score_micros", org.apache.spark.sql.types.ArrayType(
      LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "graft_hashed_gram_score_multi"

  // java.lang.Integer values: a missing key must surface as null
  // (Scala's unboxing would silently turn it into offset 0 — a WRONG
  // bucket, not a neutral one)
  @transient private lazy val model: java.util.HashMap[java.lang.Long, java.lang.Integer] = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Integer](
      buckets.length * 2)
    var i = 0
    while (i < buckets.length) {
      m.put(buckets(i), Int.box(i * nClasses)); i += 1
    }
    m
  }

  def compute(s: UTF8String): InternalRow = {
    var nGrams = 0L
    val micros = new Array[Long](nClasses)
    HashedGramScore.foreachBucket(s, nBuckets) { b =>
      nGrams += 1
      val off = model.get(b)
      if (off != null) {
        val o = off.intValue()
        var c = 0
        while (c < nClasses) { micros(c) += microsFlat(o + c); c += 1 }
      }
    }
    InternalRow(nGrams,
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(micros))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramScorerMulti", this,
      classOf[HashedGramScoreMulti].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : HashedGramScoreMulti = copy(child = newChild)
}

object HashedGramScore {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Visit the md5 hash bucket of every unigram and bigram of the
    * single-space tokenization of `s`, in gram order (w0, w0·w1, w1,
    * w1·w2, …). Byte-level: empties from consecutive spaces dropped
    * before bigram formation, bucket = first-8-hex-of-md5 as unsigned
    * % 2^31 % nBuckets — identical math to `Fns.md5Hash31(gram) %
    * nBuckets` on the concat_ws(" ") gram string, without building a
    * single intermediate string. Shared by the frozen scorer and the
    * batch count path so the two can never diverge.
    */
  def foreachBucket(s: UTF8String, nBuckets: Int)(f: Long => Unit): Unit = {
    val bytes = s.getBytes
    // word byte-ranges, empties dropped (matches filter(split, <> ''))
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var wStart = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > wStart) { starts.add(wStart); ends.add(i) }
        wStart = i + 1
      }
      i += 1
    }
    val nw = starts.size
    val md = digest.get()
    def bucketOf(): Long = {
      val d = md.digest()
      val u32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      u32 % 2147483648L % nBuckets
    }
    var w = 0
    while (w < nw) {
      md.reset()
      md.update(bytes, starts.get(w), ends.get(w) - starts.get(w))
      f(bucketOf())
      if (w + 1 < nw) {
        md.reset()
        md.update(bytes, starts.get(w), ends.get(w) - starts.get(w))
        md.update(' '.toByte)
        md.update(bytes, starts.get(w + 1), ends.get(w + 1) - starts.get(w + 1))
        f(bucketOf())
      }
      w += 1
    }
  }

  /** `(n_grams, score_micros)` struct column for a frozen
    * (bucket → micros) model over `nBuckets` md5 hash buckets. */
  def score(text: Column, nBuckets: Int,
            model: Map[Long, Long]): Column = {
    val sorted = model.toArray.sortBy(_._1)
    GraftColumnBridge.column(HashedGramScore(
      GraftColumnBridge.expression(text), nBuckets,
      sorted.map(_._1), sorted.map(_._2)))
  }

  /** Array of every unigram+bigram bucket (with multiplicity) — the
    * batch-path twin of [[score]]. */
  def buckets(text: Column, nBuckets: Int): Column =
    GraftColumnBridge.column(HashedGramBuckets(
      GraftColumnBridge.expression(text), nBuckets))

  /** `(n_grams, array of C score_micros)` struct column for a frozen
    * multiclass (bucket → C micros) model — ONE gram pass for all C
    * classes. */
  def scoreMulti(text: Column, nBuckets: Int, nClasses: Int,
                 model: Map[Long, Array[Long]]): Column = {
    val sorted = model.toArray.sortBy(_._1)
    GraftColumnBridge.column(HashedGramScoreMulti(
      GraftColumnBridge.expression(text), nBuckets, nClasses,
      sorted.map(_._1), sorted.flatMap(_._2)))
  }
}

/** text → array of md5 hash buckets of every unigram and bigram
  * (multiplicity preserved — DSIR features are counts). Same
  * single-pass byte loop as [[HashedGramScore]]; replaces the
  * `transform/concat_ws/md5/conv` column pipeline, whose per-gram
  * string building and hex→decimal-string conv dominated the batch
  * estimation pass (bench: 3.9s → the frozen twin's same hashing runs
  * in 0.3s).
  */
case class HashedGramBuckets(child: Expression, nBuckets: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(nBuckets > 0)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_gram_buckets"

  def compute(s: UTF8String): Any = {
    val out = new java.util.ArrayList[java.lang.Long]()
    HashedGramScore.foreachBucket(s, nBuckets)(b => out.add(b))
    val arr = new Array[Long](out.size)
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramBuckets", this,
      classOf[HashedGramBuckets].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : HashedGramBuckets = copy(child = newChild)
}
