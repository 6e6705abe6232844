package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two `array<float>` columns.
  *
  * The built-in route (`aggregate(zip_with(...))`) runs the
  * higher-order lambda interpreted per element — at millions of
  * candidate pairs × 64 dims that interpretation dominates the whole
  * ANN/dedup pipeline. This expression emits a tight primitive loop
  * into whole-stage codegen instead (~40× on the pair scan).
  *
  * Accumulation is double, left-to-right — bit-identical to the
  * interpreted fold and to the DuckDB oracle's list_reduce, so
  * swapping it in cannot change results.
  */
case class FloatVecDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Sign-LSH bucket id in one codegen pass: dot the input vector with
  * `nPlanes` hyperplanes (flattened row-major into `planes`) and pack
  * the sign bits into a long.
  *
  * The composed route (`aggregate(zip_with(...))` per plane) runs
  * every fold interpreted — multi-table LSH callers evaluate up to
  * 128 planes per ROW, which dominates candidate generation. Each
  * per-plane accumulation here is double, left-to-right from 0.0 —
  * bit-identical to the interpreted fold and to the DuckDB oracle's
  * list_reduce (0.0 + v0 == v0), so swapping it in cannot change
  * which side of a hyperplane any vector lands on.
  */
case class PlaneSignBucket(child: Expression, planes: Array[Double],
                           nPlanes: Int, dim: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(planes.length == nPlanes * dim, "planes must be nPlanes*dim flat")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_plane_signs"

  def compute(v: ArrayData): Long = {
    // Parity with the interpreted fold it replaced: zip_with null-pads
    // a length-mismatched vector and propagates null elements, so the
    // fold was null and EVERY plane test failed → bucket 0. Keep that
    // exact behavior for ragged/null-element vectors.
    if (v.numElements() != dim) return 0L
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return 0L
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      val off = j * dim
      var acc = 0.0
      i = 0
      while (i < dim) {
        acc += v.getFloat(i).toDouble * planes(off + i)
        i += 1
      }
      if (acc > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planeSigns", this,
      classOf[PlaneSignBucket].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : PlaneSignBucket = copy(child = newChild)
}

/** SQ8 scalar quantization: a float vector becomes one byte per
  * dimension on the per-dimension [min, max] grid — 4× less memory
  * and scan I/O for a 100 TB embedding corpus, the standard first
  * compression step before IVF/HNSW-class indexing. code[i] =
  * round((v[i]−min[i]) / scale[i]) clamped to [0,255], with
  * scale[i] = (max[i]−min[i]) / 255. Null/ragged elements encode as
  * 0 (the grid minimum) — deterministic, never poisons a whole code.
  */
case class Sq8Encode(child: Expression, mins: Array[Double],
                     scales: Array[Double])
  extends UnaryExpression with ExpectsInputTypes {

  require(mins.length == scales.length, "mins/scales must align")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType =
    org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "graft_sq8_encode"

  def compute(v: ArrayData): Array[Byte] = {
    val dim = mins.length
    val out = new Array[Byte](dim)
    val n = math.min(v.numElements(), dim)
    var i = 0
    while (i < n) {
      val q =
        if (v.isNullAt(i) || scales(i) <= 0d) 0
        else {
          // double end-to-end (floor(x+0.5) == Math.round(double)) so
          // the DuckDB oracle can reproduce every bit of the grid
          val r = math.round((v.getFloat(i).toDouble - mins(i)) / scales(i))
          if (r < 0L) 0 else if (r > 255L) 255 else r.toInt
        }
      out(i) = q.toByte
      i += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8enc", this, classOf[Sq8Encode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : Sq8Encode = copy(child = newChild)
}

/** Fused asymmetric SQ8 dot: float query · dequantized corpus code in
  * one loop — the decoded float vector is never materialized, so the
  * per-pair scan stays allocation-free inside whole-stage codegen.
  */
case class Sq8Dot(left: Expression, right: Expression,
                  mins: Array[Double], scales: Array[Double])
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), org.apache.spark.sql.types.BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_dot"

  def compute(q: ArrayData, code: Array[Byte]): Double = {
    val n = math.min(q.numElements(), math.min(code.length, mins.length))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!q.isNullAt(i))
        acc += q.getFloat(i).toDouble *
          (mins(i) + (code(i) & 0xff) * scales(i))
      i += 1
    }
    acc
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8dot", this, classOf[Sq8Dot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Dot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a dequantized SQ8 code — computed once per corpus row
  * at index build, so query-time ranking divides by a stored scalar.
  */
case class Sq8Norm(child: Expression, mins: Array[Double],
                   scales: Array[Double])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_norm"

  def compute(code: Array[Byte]): Double = {
    val n = math.min(code.length, mins.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = mins(i) + (code(i) & 0xff) * scales(i)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8norm", this, classOf[Sq8Norm].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : Sq8Norm = copy(child = newChild)
}

/** Product-quantization encode: the vector splits into `m` subspaces
  * of `dsub` dims; each subspace stores the index of its nearest
  * codebook centroid (k ≤ 256 → one byte). m bytes per vector —
  * dim·4/m× less memory and scan I/O than floats (32× at dim 64,
  * m 8), the standard billion-vector layout (Jégou et al. 2011).
  * `codebook` is flattened [j][c][t] → j·k·dsub + c·dsub + t.
  * Ties and short/ragged inputs are deterministic: argmin takes the
  * lowest centroid index; missing elements read as 0.
  */
case class PqEncode(child: Expression, codebook: Array[Float],
                    m: Int, k: Int, dsub: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(codebook.length == m * k * dsub, "codebook shape mismatch")
  require(k <= 256, "PQ codes are one byte per subspace")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType =
    org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "graft_pq_encode"

  def compute(v: ArrayData): Array[Byte] = {
    val out = new Array[Byte](m)
    val n = v.numElements()
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = (j * k + c) * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val i = j * dsub + t
          val x = if (i < n && !v.isNullAt(i)) v.getFloat(i).toDouble else 0.0
          val diff = x - codebook(base + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqenc", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : PqEncode = copy(child = newChild)
}

/** Fused asymmetric PQ dot: float query · reconstructed PQ code in
  * one loop over the codebook rows the code selects — the
  * reconstruction is never materialized (the Sq8Dot contract at 4×
  * deeper compression).
  */
case class PqAdcDot(left: Expression, right: Expression,
                    codebook: Array[Float], m: Int, k: Int, dsub: Int)
  extends BinaryExpression with ExpectsInputTypes {

  require(codebook.length == m * k * dsub, "codebook shape mismatch")
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), org.apache.spark.sql.types.BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_dot"

  def compute(q: ArrayData, code: Array[Byte]): Double = {
    val n = q.numElements()
    val mm = math.min(m, code.length)
    var acc = 0.0
    var j = 0
    while (j < mm) {
      val base = (j * k + (code(j) & 0xFF)) * dsub
      var t = 0
      while (t < dsub) {
        val i = j * dsub + t
        if (i < n && !q.isNullAt(i))
          acc += q.getFloat(i).toDouble * codebook(base + t)
        t += 1
      }
      j += 1
    }
    acc
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqadc", this, classOf[PqAdcDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of the PQ reconstruction — computed once per corpus row at
  * encode, so query-time ranking divides by a stored scalar (the
  * Sq8Norm contract).
  */
case class PqNorm(child: Expression, codebook: Array[Float],
                  m: Int, k: Int, dsub: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(codebook.length == m * k * dsub, "codebook shape mismatch")
  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_norm"

  def compute(code: Array[Byte]): Double = {
    val mm = math.min(m, code.length)
    var acc = 0.0
    var j = 0
    while (j < mm) {
      val base = (j * k + (code(j) & 0xFF)) * dsub
      var t = 0
      while (t < dsub) {
        val x = codebook(base + t).toDouble
        acc += x * x
        t += 1
      }
      j += 1
    }
    math.sqrt(acc)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqnorm", this, classOf[PqNorm].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : PqNorm = copy(child = newChild)
}

/** `array<float>` → `array<bigint>` 1e-6 fixed-point view: each
  * component rounds HALF-UP (away from zero — SQL round semantics,
  * so the DuckDB oracle's `round(x::DOUBLE * 1e6)` matches exactly).
  * The codegen replacement for `transform(v, x -> round(x*1e6))` —
  * higher-order lambdas are CodegenFallback and would interpret the
  * hot path AND break whole-stage codegen for everything downstream
  * (the PlaneSignBucket lesson, on the quantization axis). Null
  * elements and null arrays propagate as null.
  */
case class MicroVec(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType)
  override def prettyName: String = "graft_micro_vec"

  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = v.getFloat(i).toDouble * 1000000.0
        out(i) = if (x >= 0) math.floor(x + 0.5).toLong
                 else math.ceil(x - 0.5).toLong
      } // else: stays null (SQL round(null) = null)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("microVec", this,
      classOf[MicroVec].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : MicroVec = copy(child = newChild)
}

/** Nearest centroid over an INTEGER-MICRO vector (`array<bigint>`):
  * argmin over `k` centroids of the exact squared L2 distance, ties
  * to the LOWEST cluster id (strict-less keeps the first winner).
  * All arithmetic is long — the distance a SQL oracle replays
  * bit-for-bit (no float accumulation order to match). Output is a
  * (cluster, dist_micro2) struct; a ragged or null-element vector
  * yields null (callers filter — never a silent wrong cluster).
  *
  * This is the CORPUS-SCALE assignment step of [[graft.operators
  * .Kmeans]]'s distributed Lloyd: one tight codegen loop per row over
  * the broadcast-inlined centroid table (k·dim longs), no join.
  */
case class NearestCentroidMicro(child: Expression,
                                centroids: Array[Long], k: Int, dim: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(centroids.length == k * dim, "centroids must be k*dim flat")
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(org.apache.spark.sql.types.StructField("cluster",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("dist_micro2",
        org.apache.spark.sql.types.LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"

  def compute(v: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    if (v.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < k) {
      val off = c * dim
      var acc = 0L
      i = 0
      while (i < dim) {
        val diff = v.getLong(i) - centroids(off + i)
        acc += diff * diff
        i += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(best, bestD)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroidMicro].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : NearestCentroidMicro = copy(child = newChild)
}

/** TWO-LEVEL nearest-centroid over an integer-micro vector — the
  * large-k assignment tier of [[graft.operators.Kmeans]] (the
  * Ann.ivfSearch pattern applied to Lloyd assignment): the k
  * centroids are themselves clustered into `nCoarse` cells
  * (driver-side, k·dim longs); per row, the expression probes the
  * `nProbe` nearest coarse centers (exact integer L2) and runs the
  * exact argmin only over the member centroids of those cells —
  * O(nCoarse·dim + nProbe·(k/nCoarse)·dim) per row instead of
  * O(k·dim). At nProbe = nCoarse the scan covers every centroid and
  * the result is BIT-EQUAL to [[NearestCentroidMicro]] (spec-held):
  * ties break to the lowest cluster id via the explicit (dist, id)
  * comparison, so scan order cannot change the winner. At partial
  * probe the assignment is approximate (the true nearest may live in
  * an unprobed cell) but the returned distance is always the exact
  * distance to the returned cluster.
  *
  * `members`/`memberOffsets` is the CSR inverted list: cell g's
  * member centroid ids are members[memberOffsets(g) until
  * memberOffsets(g+1)), ascending.
  */
case class NearestCentroidTiered(child: Expression,
                                 centroids: Array[Long], k: Int, dim: Int,
                                 coarse: Array[Long], nCoarse: Int,
                                 memberOffsets: Array[Int],
                                 members: Array[Int], nProbe: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(centroids.length == k * dim, "centroids must be k*dim flat")
  require(coarse.length == nCoarse * dim, "coarse must be nCoarse*dim flat")
  require(memberOffsets.length == nCoarse + 1 && members.length == k,
    "members must be a CSR list over all k centroids")
  require(nProbe >= 1 && nProbe <= nCoarse)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(org.apache.spark.sql.types.StructField("cluster",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("dist_micro2",
        org.apache.spark.sql.types.LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid_tiered"

  def compute(v: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    if (v.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val vv = new Array[Long](dim)
    i = 0
    while (i < dim) { vv(i) = v.getLong(i); i += 1 }
    // 1. exact L2 to every coarse center; keep the nProbe best by
    // (dist, cell id) — insertion into a tiny sorted buffer
    val probeCell = new Array[Int](nProbe)
    val probeDist = Array.fill[Long](nProbe)(Long.MaxValue)
    var g = 0
    while (g < nCoarse) {
      val off = g * dim
      var acc = 0L
      i = 0
      while (i < dim) {
        val diff = vv(i) - coarse(off + i)
        acc += diff * diff
        i += 1
      }
      if (acc < probeDist(nProbe - 1)) {
        var p = nProbe - 1
        while (p > 0 && probeDist(p - 1) > acc) {
          probeDist(p) = probeDist(p - 1); probeCell(p) = probeCell(p - 1)
          p -= 1
        }
        probeDist(p) = acc; probeCell(p) = g
      }
      g += 1
    }
    // 2. exact argmin within the probed cells' members; explicit
    // (dist, id) tie-break so scan order never changes the winner
    var best = -1
    var bestD = Long.MaxValue
    var p = 0
    while (p < nProbe) {
      if (probeDist(p) != Long.MaxValue) {
        val cell = probeCell(p)
        var m = memberOffsets(cell)
        val end = memberOffsets(cell + 1)
        while (m < end) {
          val c = members(m)
          val off = c * dim
          var acc = 0L
          i = 0
          while (i < dim) {
            val diff = vv(i) - centroids(off + i)
            acc += diff * diff
            i += 1
          }
          if (acc < bestD || (acc == bestD && c < best)) {
            bestD = acc; best = c
          }
          m += 1
        }
      }
      p += 1
    }
    if (best < 0) null // every probed cell empty — no assignment
    else org.apache.spark.sql.catalyst.InternalRow(best, bestD)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroidTiered", this,
      classOf[NearestCentroidTiered].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : NearestCentroidTiered = copy(child = newChild)
}

object VectorExpressions {

  /** Column-level entry point for the codegen'd dot product. */
  def dotF(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      FloatVecDot(GraftColumnBridge.expression(a),
                  GraftColumnBridge.expression(b)))

  /** Column-level entry point for the codegen'd sign-LSH bucket. */
  def planeSigns(vec: Column, planes: Array[Double], nPlanes: Int,
                 dim: Int): Column =
    GraftColumnBridge.column(PlaneSignBucket(
      GraftColumnBridge.expression(vec), planes, nPlanes, dim))

  def sq8Encode(vec: Column, mins: Array[Double],
                scales: Array[Double]): Column =
    GraftColumnBridge.column(
      Sq8Encode(GraftColumnBridge.expression(vec), mins, scales))

  def sq8Dot(query: Column, code: Column, mins: Array[Double],
             scales: Array[Double]): Column =
    GraftColumnBridge.column(Sq8Dot(GraftColumnBridge.expression(query),
      GraftColumnBridge.expression(code), mins, scales))

  def sq8Norm(code: Column, mins: Array[Double],
              scales: Array[Double]): Column =
    GraftColumnBridge.column(
      Sq8Norm(GraftColumnBridge.expression(code), mins, scales))

  def pqEncode(vec: Column, codebook: Array[Float], m: Int, k: Int,
               dsub: Int): Column =
    GraftColumnBridge.column(
      PqEncode(GraftColumnBridge.expression(vec), codebook, m, k, dsub))

  def pqAdcDot(query: Column, code: Column, codebook: Array[Float],
               m: Int, k: Int, dsub: Int): Column =
    GraftColumnBridge.column(PqAdcDot(GraftColumnBridge.expression(query),
      GraftColumnBridge.expression(code), codebook, m, k, dsub))

  def pqNorm(code: Column, codebook: Array[Float], m: Int, k: Int,
             dsub: Int): Column =
    GraftColumnBridge.column(
      PqNorm(GraftColumnBridge.expression(code), codebook, m, k, dsub))

  def nearestCentroid(vm: Column, centroids: Array[Long], k: Int,
                      dim: Int): Column =
    GraftColumnBridge.column(NearestCentroidMicro(
      GraftColumnBridge.expression(vm), centroids, k, dim))

  def nearestCentroidTiered(vm: Column, centroids: Array[Long], k: Int,
                            dim: Int, coarse: Array[Long], nCoarse: Int,
                            memberOffsets: Array[Int], members: Array[Int],
                            nProbe: Int): Column =
    GraftColumnBridge.column(NearestCentroidTiered(
      GraftColumnBridge.expression(vm), centroids, k, dim, coarse,
      nCoarse, memberOffsets, members, nProbe))

  def microVec(vec: Column): Column =
    GraftColumnBridge.column(MicroVec(GraftColumnBridge.expression(vec)))

  /** Register the full graft SQL surface in an existing session
    * (kept for source compatibility — see [[GraftSqlFunctions]]). */
  def register(spark: SparkSession): Unit =
    GraftSqlFunctions.register(spark)
}
