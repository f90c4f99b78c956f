package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector dot product in double precision with LEFT-TO-RIGHT
  * accumulation — the exact-KNN hot loop behind
  * graft.operators.Similarity (cosine distances, norms, L2² via the
  * dot identity). Bit-identical to the former
  * `aggregate(zip_with(a, b, x·y), 0.0, +)` column formulation (same
  * element-wise float→double widening, same summation order, so every
  * rounded distance and DuckDB oracle is unchanged) — but those
  * higher-order functions evaluate interpreted, one lambda closure per
  * element; this native Expression's generated code is a single fused
  * multiply-add loop inside whole-stage codegen.
  *
  * Accepts float or double arrays on either side (the corpus column is
  * float[], query literals are double[]).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_dot expects (array<float|double>, array<float|double>), " +
        s"got (${left.dataType.catalogString}, " +
        s"${right.dataType.catalogString})")

  private def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], isFloat(left.dataType),
      b.asInstanceOf[ArrayData], isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val (lf, rf) = (isFloat(left.dataType), isFloat(right.dataType))
    val cls = "graft.functions.VecDot"
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = $cls.dot($a, $lf, $b, $rf);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)

  override def prettyName: String = "vec_dot"
}

object VecDot {

  /** Static kernel shared by interpreted eval and generated code.
    * (double)(float) widening is exact, so the float path equals the
    * former per-element Cast.
    *
    * Registered session-wide, so ad-hoc SQL callers can reach it with
    * arguments no internal caller produces: a length mismatch or null
    * element fails fast with a clear error (UnsafeArrayData would
    * otherwise silently return garbage on an out-of-range read). */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData,
      bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n) throw new IllegalArgumentException(
      s"vec_dot: array length mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"vec_dot: null element at index $i")
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1)),
      "built-in")
}

/** Integer sibling of [[VecDot]] for the int8-quantization path
  * (graft.operators.Quantize): per-element INT multiply (codes are
  * ≤127 in magnitude, so the 32-bit product is exact) widened to LONG
  * for accumulation — identical to the former
  * `aggregate(zip_with(a, b, (x·y)::long), 0L, +)` fold. */
case class IVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ivec_dot expects (array<int>, array<int>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    IVecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = "graft.functions.IVecDot"
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = $cls.dot($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)

  override def prettyName: String = "ivec_dot"
}

object IVecDot {

  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n) throw new IllegalArgumentException(
      s"ivec_dot: array length mismatch ($n vs ${b.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"ivec_dot: null element at index $i")
      acc += (a.getInt(i) * b.getInt(i)).toLong
      i += 1
    }
    acc
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ivec_dot",
      (exprs: Seq[Expression]) => IVecDot(exprs(0), exprs(1)),
      "built-in")
}
