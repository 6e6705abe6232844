package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-shingle hasher: text → array of DISTINCT 64-bit
  * hashes of its n-word shingles.
  *
  * Replaces the `transform(sequence(...), i -> concat_ws(...))` +
  * `array_distinct` + `xxhash64` pipeline, which runs interpreted
  * per element and dominated the dedup queries. One pass over the
  * bytes, zero intermediate strings: word hashes are FNV-1a over the
  * word bytes, shingle hashes a murmur-style mix of n consecutive
  * word hashes. Any deterministic 64-bit family works here — the
  * hash only needs to agree with itself across the join sides.
  */
case class ShingleHash(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash"

  def compute(s: UTF8String): ArrayData = {
    val seen = ShingleHash.distinctShingleHashes(s, n)
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHasher", this, classOf[ShingleHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

/** Single-pass 64-bit SimHash over the words of a text column: per
  * word an FNV-1a hash, each of whose 64 bits votes +1/-1; signature
  * bits are the positive vote counts. One tight loop per row inside
  * whole-stage codegen — replaces 64 interpreted array folds (scalar
  * path) or a 64-aggregate shuffle (columnar path).
  *
  * `seed` offsets the word-hash basin, yielding an INDEPENDENT 64-bit
  * signature family — wide-simhash callers concatenate several seeds'
  * signatures for bigger (more selective) band keys.
  */
case class SimHash64(child: Expression, seed: Long = ShingleHash.FnvOffset)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var h = seed
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
        h = seed
      } else {
        h = (h ^ (bytes(i) & 0xffL)) * ShingleHash.FnvPrime
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHasher", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def simhash64(text: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(text)))

  /** Independent signature family for wide-simhash banding. Family 0
    * is the canonical simhash64. */
  def simhash64(text: Column, family: Int): Column =
    if (family == 0) simhash64(text)
    else GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(text),
      ShingleHash.mix(ShingleHash.FnvOffset, family.toLong)))
}

object ShingleHash {
  val FnvOffset: Long = 0xcbf29ce484222325L
  val FnvPrime: Long = 0x100000001b3L
  val Seed: Long = 0x2545F4914F6CDD1DL

  /** murmur3-fmix-style combine — fast, well-distributed, stateless. */
  def mix(acc: Long, v: Long): Long = {
    var h = acc ^ (v * 0x87c37b91114253d5L)
    h = java.lang.Long.rotateLeft(h, 31) * 0x4cf5ad432745937fL
    h ^= h >>> 33
    h
  }

  /** The single-pass loop behind [[ShingleHash]] and
    * [[ShingleOverlap]]: distinct 64-bit shingle hashes of `s`, in
    * first-occurrence order (word hashes FNV-1a, shingle hashes the
    * [[mix]] of n consecutive word hashes — any change here changes
    * BOTH the array and the overlap-count expressions identically,
    * which is the point of sharing it).
    */
  def distinctShingleHashes(s: UTF8String, n: Int)
  : java.util.LinkedHashSet[java.lang.Long] = {
    val bytes = s.getBytes
    // 1. hash each word (single-space tokenizer, matching Fns.words)
    val wordHashes = new java.util.ArrayList[java.lang.Long]()
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { wordHashes.add(h); h = FnvOffset }
      else h = (h ^ (bytes(i) & 0xffL)) * FnvPrime
      i += 1
    }
    wordHashes.add(h) // final word (empty text still yields one "word",
                      // matching split(text, ' ') semantics)
    val nw = wordHashes.size
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (nw < n) return seen
    // 2. mix n consecutive word hashes per shingle, dedup
    var j = 0
    while (j <= nw - n) {
      var acc = Seed
      var k = 0
      while (k < n) {
        acc = mix(acc, wordHashes.get(j + k))
        k += 1
      }
      seen.add(acc)
      j += 1
    }
    seen
  }

  def shingles(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      ShingleHash(GraftColumnBridge.expression(text), n))

  def overlapCount(text: Column, n: Int, frozen: Seq[Long]): Column =
    GraftColumnBridge.column(
      ShingleOverlap(GraftColumnBridge.expression(text), n, frozen))

  def shingleStrings(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      ShingleStrings(GraftColumnBridge.expression(text), n))

  def minhashMd5(text: Column, n: Int, k: Int): Column =
    GraftColumnBridge.column(
      MinHashMd5(GraftColumnBridge.expression(text), n, k))

  def gramProject(text: Column, n: Int, dim: Int): Column =
    GraftColumnBridge.column(
      GramProject(GraftColumnBridge.expression(text), n, dim))

  /** Distinct n-word shingle STRINGS of `s`, first-occurrence order —
    * the portable (SQL-replayable) twin of [[distinctShingleHashes]]:
    * words are the single-space split INCLUDING empties (exactly
    * `string_split(text, ' ')` / `split(text, ' ')`), shingles the
    * space-join of n consecutive words (exactly
    * `concat_ws(' ', ws[i], …)`).
    */
  def distinctShingleStrings(s: UTF8String, n: Int)
  : java.util.LinkedHashSet[String] = {
    val words = s.toString.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]()
    if (words.length < n) return seen
    var j = 0
    while (j <= words.length - n) {
      val sb = new java.lang.StringBuilder(words(j))
      var m = 1
      while (m < n) { sb.append(' ').append(words(j + m)); m += 1 }
      seen.add(sb.toString)
      j += 1
    }
    seen
  }
}

/** Distinct n-word shingles as STRINGS — the oracle-replayable twin
  * of [[ShingleHash]] (identical split + join semantics to the SQL
  * `list_distinct(list_transform(generate_series(…), i ->
  * concat_ws(' ', ws[i], …)))` chain), as one codegen pass instead of
  * three interpreted higher-order lambdas. Feeds the md5 dedup
  * family's exact-Jaccard verify, where the shingle VALUES must
  * replay in portable SQL (the hashed family's FNV/murmur values
  * cannot).
  */
case class ShingleStrings(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_strings"

  def compute(s: UTF8String): ArrayData = {
    val seen = ShingleHash.distinctShingleStrings(s, n)
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) {
      out(m) = UTF8String.fromString(it.next()); m += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleStrings", this,
      classOf[ShingleStrings].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : ShingleStrings = copy(child = newChild)
}

/** PORTABLE-md5 MinHash signature: text → array of k min-hashes over
  * the distinct n-word shingle strings, where hash i of shingle s is
  * the engine's replayable md5 draw
  * `('0x' || substr(md5('mh' || (i DIV 4) || ':' || s),
  * 1 + 8*(i % 4), 8))::BIGINT % 2147483648` — four 31-bit values per
  * digest (one digest covers 4 hash indices, the [[graft.operators
  * .Sketch]] h1/h2 offset idiom widened), so the per-shingle cost is
  * ceil(k/4) digests, not k. Texts with fewer than n words return an
  * EMPTY array (the SQL side has no shingle rows to aggregate —
  * filter on size(sig) = k).
  *
  * This is the ORACLE family of the engine's two-family dedup hash
  * contract (the bloom/CM precedent): [[ShingleHash]]+xxhash64 is
  * the production family (faster, not SQL-portable), this one makes
  * every min-hash, band key, candidate pair and verify replayable in
  * DuckDB. One codegen pass per row; the MessageDigest is
  * thread-local.
  */
case class MinHashMd5(child: Expression, n: Int, k: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1 && k >= 1)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_md5"

  def compute(s: UTF8String): ArrayData = {
    val seen = ShingleHash.distinctShingleStrings(s, n)
    if (seen.isEmpty) return new GenericArrayData(Array.empty[Long])
    val mins = Array.fill[Long](k)(Long.MaxValue)
    val md = MinHashMd5.digests.get()
    val nd = (k + 3) / 4
    val it = seen.iterator()
    while (it.hasNext) {
      val sh = it.next()
      var d = 0
      while (d < nd) {
        md.reset()
        val bytes = md.digest(
          ("mh" + d + ":" + sh).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var q = 0
        while (q < 4 && d * 4 + q < k) {
          val h = MinHashMd5.head31(bytes, q * 4)
          val i = d * 4 + q
          if (h < mins(i)) mins(i) = h
          q += 1
        }
        d += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashMd5", this,
      classOf[MinHashMd5].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : MinHashMd5 = copy(child = newChild)
}

object MinHashMd5 {
  private[functions] val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Four digest bytes at `off`, big-endian unsigned, & 0x7fffffff —
    * the ONE JVM assembly of the engine's portable 31-bit SQL draw
    * `('0x' || substr(md5hex, 1+2*off, 8))::BIGINT % 2147483648`,
    * shared by every md5-derived expression so the families cannot
    * drift from each other or from the oracle idiom. */
  private[functions] def head31(bytes: Array[Byte], off: Int): Long =
    (((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
      ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)) &
      0x7fffffffL
}

/** GRAM-PROJECTION near-dup embedding: text → a dim-long integer
  * vector, component j = Σ over the doc's DISTINCT n-word shingles s
  * of sign_j(s), where sign_j(s) = +1 if bit j of the portable
  * 31-bit md5 draw of 'gp:'||s is set, else −1 — the feature-hashing
  * signed random projection (Charikar 2002's dense SimHash form /
  * Achlioptas 2003 ±1 projections / Weinberger 2009 hashing trick):
  * cosine over these vectors concentrates around the shingle-set
  * resemblance, so near-duplicate text gets near-parallel vectors.
  * The modern "learned near-dup embedding" recipe (RETSim) serves
  * its model through exactly this ANN-over-doc-vectors shape; this
  * is the model-free, ORACLE-REPLAYABLE instance — one md5 draw per
  * shingle yields all dim ≤ 31 signs, integer sums are exact in any
  * engine, and the vectors feed the existing ANN tier (cast to
  * float — components are small integers, float-exact) for IVF/SQ8
  * serving.
  *
  * One codegen pass per row, no explode; texts with fewer than n
  * words return an EMPTY array (filter on size = dim).
  */
case class GramProject(child: Expression, n: Int, dim: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1 && dim >= 1 && dim <= 31,
    "dim must be in [1, 31] (signs come from one 31-bit md5 draw)")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_project"

  def compute(s: UTF8String): ArrayData = {
    val seen = ShingleHash.distinctShingleStrings(s, n)
    if (seen.isEmpty) return new GenericArrayData(Array.empty[Long])
    val acc = new Array[Long](dim)
    val md = MinHashMd5.digests.get()
    val it = seen.iterator()
    while (it.hasNext) {
      val sh = it.next()
      md.reset()
      val bytes = md.digest(
        ("gp:" + sh).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = MinHashMd5.head31(bytes, 0)
      var j = 0
      while (j < dim) {
        acc(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
    }
    new GenericArrayData(acc)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramProject", this,
      classOf[GramProject].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : GramProject = copy(child = newChild)
}

/** Count of a text's distinct n-word shingles that fall in a FROZEN
  * hash set — the stateless (streaming-safe) form of eval-set
  * decontamination: the eval corpus's shingle set is derived once
  * offline, shipped as part of the expression, and each document is
  * scored in one pass with a hash-set probe per shingle. Shares the
  * exact loop of [[ShingleHash]], so
  * `overlapCount(text) == |shingles(text) ∩ frozen|` bit-for-bit.
  */
case class ShingleOverlap(child: Expression, n: Int, frozen: Seq[Long])
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_shingle_overlap"

  @transient private lazy val frozenSet: java.util.HashSet[java.lang.Long] = {
    val s = new java.util.HashSet[java.lang.Long](frozen.size * 2)
    frozen.foreach(v => s.add(v))
    s
  }

  def compute(s: UTF8String): Long = {
    val it = ShingleHash.distinctShingleHashes(s, n).iterator()
    var c = 0L
    while (it.hasNext) if (frozenSet.contains(it.next())) c += 1
    c
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleOverlap", this,
      classOf[ShingleOverlap].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : ShingleOverlap = copy(child = newChild)
}
