package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Symmetric int8 max-abs quantization of one embedding vector —
  * the per-row hot loop of graft.operators.Quantize:
  *
  *   scale  = max(max_i |v_i|, 1e-12)
  *   code_i = (int) floor(v_i / scale * 127 + 0.5)
  *
  * emitted as a (scale DOUBLE, codes ARRAY<INT>) struct in ONE pass.
  *
  * Exists as a native Catalyst `Expression` WITH `doGenCode` for the
  * same reason as [[VecDot]]/[[PqEncode]]: the column formulation
  * (array_max∘transform for the scale, a second transform for the
  * codes) evaluates higher-order lambdas interpreted — ~128 closures
  * per row, and the quantization chain dominated every codes()-family
  * bench entry (knn_quantized paid ~0.5 s/rep at 5k×64). Arithmetic is
  * BIT-IDENTICAL to the former columns (same float→double widening,
  * same floor+cast-to-int), so persisted results and the DuckDB
  * oracles are unchanged.
  */
case class QuantizeI8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantize_i8 expects array<float|double>, got $other")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    QuantizeI8.quantize(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = "graft.functions.QuantizeI8"
    nullSafeCodeGen(ctx, ev,
      v => s"${ev.value} = $cls.quantize($v, $isFloat);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)

  override def prettyName: String = "quantize_i8"
}

object QuantizeI8 {

  private val Tiny = 1e-12 // all-zero-vector guard: codes become zeros

  /** Static kernel shared by interpreted eval and generated code.
    * (Named `quantize`, not `eval`: an Expression-companion method
    * named eval gets no static forwarder and the generated call fails
    * to resolve — silent interpreted fallback.) */
  def quantize(v: ArrayData, isFloat: Boolean): InternalRow = {
    val n = v.numElements()
    var scale = Tiny
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) throw new IllegalArgumentException(
        s"quantize_i8: null element at index $i")
      val x = math.abs(
        if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
      if (x > scale) scale = x
      i += 1
    }
    val codes = new Array[Int](n)
    i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      codes(i) = math.floor(x / scale * 127.0 + 0.5).toInt
      i += 1
    }
    new GenericInternalRow(
      Array[Any](scale, new GenericArrayData(codes)))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantize_i8",
      (exprs: Seq[Expression]) => QuantizeI8(exprs.head),
      "built-in")
}
