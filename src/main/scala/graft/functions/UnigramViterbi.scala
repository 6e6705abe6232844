package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Viterbi segmentation of a single WORD against a frozen
  * unigram cost table — the native-expression form of
  * [[graft.operators.Unigram]]'s minimum-cost DP (the
  * [[HashedGramScore]] precedent: a frozen vocabulary-sized model
  * rides the expression, lookups hit a real hash map, and the whole
  * thing stays inside whole-stage codegen as one projection — no
  * explode, no join, no shuffle, stream-safe).
  *
  * Semantics are EXACTLY the operator's declared contract, spec-held
  * against its sequential reference and brute-force path enumeration
  * (UnigramSpec): dp[j] = min over i of dp[i] + cost(word[i+1..j]),
  * ties to the SMALLEST piece start (≡ the smallest reversed-
  * breakpoint path — the total order the q_unigram_encode oracle
  * sorts on), pieces limited to `maxPieceLen`, cost in exact long
  * micros. "Character" means CODE POINT (the [[graft.operators.Bpe]]
  * convention — Spark's substring is code-point indexed, so a
  * non-BMP character is one DP position, never two surrogate
  * halves). A word no vocab path covers returns NULL.
  *
  * Why an expression and not the equivalent higher-order `aggregate`
  * fold: `element_at` on a MapType literal is a LINEAR scan, so a
  * 2k-piece vocabulary paid ~2k comparisons per DP arc (measured 70 s
  * for an 11k-row probe corpus); the hash map makes the arc O(1) and
  * the same probe ~20× faster. Cost is O(|word| · maxPieceLen) arcs
  * either way.
  */
case class UnigramViterbi(child: Expression, pieces: Array[String],
                          costMicros: Array[Long], maxPieceLen: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(pieces.length == costMicros.length && pieces.nonEmpty &&
    maxPieceLen >= 1)

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false)),
    StructField("cost_micro", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_unigram_viterbi"

  @transient private lazy val model: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), costMicros(i)); i += 1 }
    m
  }

  def compute(word: UTF8String): InternalRow =
    ViterbiDp.run(word, model, maxPieceLen, null)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramViterbi", this,
      classOf[UnigramViterbi].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : UnigramViterbi = copy(child = newChild)
}

object UnigramViterbi {

  /** Column builder: Viterbi result struct (pieces, cost_micro) of a
    * word column under a frozen cost map; NULL when no vocab path
    * covers the word. Model arrays are key-sorted so equal maps build
    * equal expressions. */
  def segment(word: Column, costs: Map[String, Long],
              maxPieceLen: Int): Column = {
    val sorted = costs.toArray.sortBy(_._1)
    GraftColumnBridge.column(UnigramViterbi(
      GraftColumnBridge.expression(word),
      sorted.map(_._1), sorted.map(_._2), maxPieceLen))
  }
}

/** The shared Viterbi forward-DP + backtrack: minimum perturbed cost,
  * ties to the smallest piece start. `noise` (nullable) adds a
  * per-arc term to the frozen piece cost — null means exact Viterbi
  * ([[UnigramViterbi]]); [[UnigramSample]] passes seeded Gumbel
  * noise. One implementation so the exact and sampled modes cannot
  * drift in DP mechanics. */
private[functions] object ViterbiDp {
  val Inf: Long = Long.MaxValue / 4

  trait ArcNoise { def apply(i: Int, j: Int): Long }

  def run(word: UTF8String,
          model: java.util.HashMap[String, java.lang.Long],
          maxPieceLen: Int, noise: ArcNoise): InternalRow = {
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return null
    val dpCost = new Array[Long](n + 1)
    val dpParent = new Array[Int](n + 1)
    dpCost(0) = 0L; dpParent(0) = -1
    var j = 1
    while (j <= n) {
      var bestC = Inf
      var bestI = -1
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (dpCost(i) < Inf) {
          val c = model.get(new String(cps, i, j - i))
          if (c != null) {
            val arc =
              if (noise == null) c.longValue
              else c.longValue + noise(i, j)
            val s = dpCost(i) + arc
            // overflow-saturated: a wrapped sum (sign of s disagrees
            // with both addends') must not silently win the min —
            // treat it as unreachable (integerCosts bounds total
            // corpus cost, but a cnt=1 piece near the guard bound
            // can still push a pathological path past Long range)
            if (((dpCost(i) ^ s) & (arc ^ s)) >= 0 && s < bestC) {
              bestC = s
              bestI = i
            }
          }
        }
        i += 1
      }
      dpCost(j) = bestC; dpParent(j) = bestI
      j += 1
    }
    if (dpCost(n) >= Inf) return null
    var k = n
    var cnt = 0
    while (k > 0) { k = dpParent(k); cnt += 1 }
    val out = new Array[Any](cnt)
    k = n
    var idx = cnt - 1
    while (k > 0) {
      val p = dpParent(k)
      out(idx) = UTF8String.fromString(new String(cps, p, k - p))
      idx -= 1; k = p
    }
    InternalRow(new GenericArrayData(out), dpCost(n))
  }
}

/** SUBWORD REGULARIZATION (Kudo 2018 §3.2's practical form): a
  * SAMPLED segmentation per word OCCURRENCE — a seeded CENTERED
  * Gumbel draw of scale `alphaMicro` is SUBTRACTED from every arc's
  * piece cost and the perturbed-minimum path wins (perturb-and-MAP
  * for softmax(-cost/alpha): argmin(cost - alpha·Gumbel); centering
  * removes the per-arc length bias, so paths with more pieces get no
  * free mean discount). alphaMicro = 0 degenerates to exact Viterbi
  * bit-for-bit (spec-held); larger alpha spreads probability over
  * near-optimal segmentations — the training-data augmentation the
  * unigram tokenizer exists to enable. Exact path-posterior sampling
  * would need forward-filter/backward-sample (or one draw per PATH);
  * per-arc perturb-and-MAP is the standard one-pass approximation
  * that keeps encode a single projection — spec-held to ≈ the
  * softmax ratios on a two-path fixture.
  *
  * Fully DETERMINISTIC (the engine's seeded-draw contract, the
  * Gumbel-top-k precedent in Dsir): noise = standard Gumbel from
  * xxhash64(salt, arc), so the same (seed, doc, occurrence) always
  * samples the same segmentation, different occurrences of the same
  * word sample independently, and replays are exact. `salt` is the
  * second child — callers derive it per occurrence (xxhash64 of
  * seed, doc id, word index). */
case class UnigramSample(word: Expression, salt: Expression,
                         pieces: Array[String], costMicros: Array[Long],
                         maxPieceLen: Int, alphaMicro: Long)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with ExpectsInputTypes {

  require(pieces.length == costMicros.length && pieces.nonEmpty &&
    maxPieceLen >= 1 && alphaMicro >= 0L)

  override def left: Expression = word
  override def right: Expression = salt
  override def inputTypes: Seq[DataType] =
    Seq(StringType, org.apache.spark.sql.types.LongType)
  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false)),
    StructField("cost_micro", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_unigram_sample"

  @transient private lazy val model: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), costMicros(i)); i += 1 }
    m
  }

  def compute(w: UTF8String, saltV: Long): InternalRow = {
    val noise: ViterbiDp.ArcNoise =
      if (alphaMicro == 0L) null
      else new ViterbiDp.ArcNoise {
        def apply(i: Int, j: Int): Long = {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashLong(i.toLong * 131071L + j, saltV)
          // uniform in (0,1) exclusive: top 53 bits, half-ulp offset
          val u = ((h >>> 11) + 0.5) * (1.0 / (1L << 53))
          // SUBTRACT the CENTERED Gumbel draw: perturb-and-MAP for
          // softmax(-cost/alpha) is argmin(cost - alpha*Gumbel);
          // adding it would mis-weight alternatives (argmax of
          // +Gumbel is the max-stable direction, spec-held via the
          // objective's skew). Centering (minus the Euler-Mascheroni
          // mean 0.5772…) removes the per-arc length bias the raw
          // draw carries — E[noise] = 0, so a 2-piece path is not
          // handed 0.577·alpha of free discount over a 1-piece path;
          // argmin over equal-length alternatives is unchanged
          // (common shift), and alpha = 0 stays exact Viterbi.
          -math.rint(alphaMicro *
            (-math.log(-math.log(u)) - 0.5772156649015329)).toLong
        }
      }
    ViterbiDp.run(w, model, maxPieceLen, noise)
  }

  override protected def nullSafeEval(w: Any, s: Any): Any =
    compute(w.asInstanceOf[UTF8String], s.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSample", this,
      classOf[UnigramSample].getName)
    nullSafeCodeGen(ctx, ev, (w, s) => s"""
      ${ev.value} = $ref.compute($w, $s);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression)
  : UnigramSample = copy(word = newLeft, salt = newRight)
}

object UnigramSample {

  /** Column builder: one sampled segmentation of `word` under the
    * frozen cost map, drawn deterministically from `salt`. */
  def segment(word: Column, salt: Column, costs: Map[String, Long],
              maxPieceLen: Int, alphaMicro: Long): Column = {
    val sorted = costs.toArray.sortBy(_._1)
    GraftColumnBridge.column(UnigramSample(
      GraftColumnBridge.expression(word),
      GraftColumnBridge.expression(salt),
      sorted.map(_._1), sorted.map(_._2), maxPieceLen, alphaMicro))
  }
}
