package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) as a
  * first-class MERGEABLE aggregate: `hll_sketch(key)` folds a
  * partition's keys into a 2^p-byte register array in ONE pass,
  * partial states merge by element-wise max (associative +
  * commutative + idempotent — exactly Spark's partial-aggregation
  * contract, and exactly what a 1000-executor tree merge needs),
  * and the resulting BINARY column is a persistable artifact:
  * store one sketch row per (shard × slice) and any later
  * distinct-count over any slice union is `hll_merge` +
  * `hll_estimate` over the sketch TABLE — the 100 TB corpus is
  * never rescanned.
  *
  * The hash family is the engine's portable md5 idiom
  * ([[Fns.md5Hash31]]'s parent): register index = the first 8 md5
  * hex chars (32-bit) mod 2^p, rho = leading-zero count of the next
  * 8 hex chars + 1. That makes every register REPLAYABLE BY THE SQL
  * ORACLE (md5 + bin + ltrim), which is how q_distinct_hll holds a
  * probabilistic operator to an exact cross-engine check: the
  * estimate is deterministic given the data, only its ERROR vs the
  * exact count is probabilistic.
  *
  * Reference parity: the reference exposes only exact COUNT
  * aggregation (feature_statistics.py / FeatureStatisticsService) —
  * the sketch family is the engine's scale path beyond it.
  */
object HllSketch {

  /** Register count exponent: m = 2^p registers, std error ~1.04/sqrt(m). */
  val DefaultP = 8

  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1 + 1.079 / m.toDouble)
  }

  /** The estimator over a register array — shared by the aggregate's
    * eval, the scalar expression, and the in-plan oracle twin.
    * Small-range (linear counting) correction when E <= 2.5m and
    * empty registers remain; no large-range correction (64-bit-hash
    * variants need it, this 32-bit family caps at ~1e8 distinct per
    * sketch — documented, and per-slice sketches at 100 TB sit far
    * below it).
    */
  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xff
      sum += java.lang.Math.pow(2.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = alpha(m) * m.toDouble * m.toDouble / sum
    if (raw <= 2.5 * m && zeros > 0)
      m.toDouble * java.lang.Math.log(m.toDouble / zeros)
    else raw
  }

  /** (register index, rho) of one key under the portable md5 family. */
  def indexAndRho(key: UTF8String, p: Int): (Int, Int) = {
    val md = MessageDigest.getInstance("MD5")
    val d = md.digest(key.getBytes)
    val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    val h2 = (((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)).toInt
    val idx = (h1 % (1L << p)).toInt
    val rho = Integer.numberOfLeadingZeros(h2) + 1
    (idx, rho)
  }

  /** `hll_sketch(key)`: binary 2^p-register sketch of a key column. */
  def sketch(key: Column, p: Int = DefaultP): Column =
    GraftColumnBridge.column(
      HllSketchAgg(GraftColumnBridge.expression(key), p).toAggregateExpression())

  /** `hll_merge(sketch)`: union of sketch columns (re-aggregation). */
  def merge(sk: Column): Column =
    GraftColumnBridge.column(
      HllMergeAgg(GraftColumnBridge.expression(sk)).toAggregateExpression())

  /** `hll_estimate(sketch)`: distinct-count estimate of a sketch. */
  def estimateCol(sk: Column): Column =
    GraftColumnBridge.column(HllEstimate(GraftColumnBridge.expression(sk)))
}

/** One-pass HLL register accumulation over a string key column. */
case class HllSketchAgg(
    child: Expression,
    p: Int = HllSketch.DefaultP,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with ExpectsInputTypes {

  require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buf: Array[Byte], row: org.apache.spark.sql.catalyst.InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) {
      val (idx, rho) = HllSketch.indexAndRho(v.asInstanceOf[UTF8String], p)
      if (rho > (buf(idx) & 0xff)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) {
      if ((other(i) & 0xff) > (buf(i) & 0xff)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = c.head)
}

/** Union of persisted sketches: element-wise register max. */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_hll_merge"

  // Sized lazily on the first input: merge must accept any p.
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def maxInto(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other.clone()
    else {
      require(buf.length == other.length,
        s"sketch size mismatch: ${buf.length} vs ${other.length}")
      var i = 0
      while (i < buf.length) {
        if ((other(i) & 0xff) > (buf(i) & 0xff)) buf(i) = other(i)
        i += 1
      }
      buf
    }

  override def update(buf: Array[Byte], row: org.apache.spark.sql.catalyst.InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v == null) buf else maxInto(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    maxInto(buf, other)

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = c.head)
}

/** Scalar estimator: binary sketch → distinct-count estimate. */
case class HllEstimate(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hll_estimate"

  def compute(b: Array[Byte]): Double = HllSketch.estimate(b)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hllEst", this, classOf[HllEstimate].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}
