package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native kernels for the binary-quantization family
  * (graft.operators.BinaryQuant). The original column formulation
  * statically unrolled 32 CASE terms per packed word and 64 weighted
  * mismatch terms per asymmetric score; inside one whole-stage-codegen
  * stage that put the generated `processNext()` past the JVM's 64 KB
  * method limit — janino failed, and Spark silently fell back to
  * INTERPRETED evaluation for the hottest scan in the family (the
  * round-10 BENCHNOTES anti-pattern, caught by the round-11 scale
  * ladder: bq_ann grew 2.3× where a 16-byte-row scan should be nearly
  * free). Each kernel is now one tight loop behind a single generated
  * call, bit-identical to the unrolled terms it replaces
  * (oracle-verified: bq_ann/bq_recall hashes unchanged).
  */
object BqKernels {

  /** Shared static kernel: pack 32 sign bits of v[off..off+32) —
    * bit i set iff the element is STRICTLY positive (float widened to
    * double exactly, so the sign test equals the former
    * `element_at(v, i).cast(double) > 0`). */
  def pack(v: ArrayData, vFloat: Boolean, off: Int): Long = {
    if (off < 0 || off + 32 > v.numElements())
      throw new IllegalArgumentException(
        s"bq_pack: window [$off, ${off + 32}) out of range for " +
          s"${v.numElements()} elements")
    var w = 0L
    var i = 0
    while (i < 32) {
      if (v.isNullAt(off + i)) throw new IllegalArgumentException(
        s"bq_pack: null element at index ${off + i}")
      val x = if (vFloat) v.getFloat(off + i).toDouble
              else v.getDouble(off + i)
      if (x > 0.0) w |= (1L << i)
      i += 1
    }
    w
  }

  /** Shared static kernel: asymmetric score of packed words (w0, w1)
    * against the 64-dim full-precision query — each sign mismatch at
    * dim i costs |round(q_i·1e6)| micro-units. `Math.round(|q_i|·1e6)`
    * is half-away-from-zero on the non-negative input, identical to
    * the former `abs(round(q_i·1e6, 0))` and to the oracle's
    * `abs(CAST(round(q·1e6) AS BIGINT))`. */
  def asym(w0: Long, w1: Long, q: ArrayData, qFloat: Boolean): Long = {
    if (q.numElements() != 64) throw new IllegalArgumentException(
      s"bq_asym: expected a 64-dim query, got ${q.numElements()}")
    var acc = 0L
    var i = 0
    while (i < 64) {
      if (q.isNullAt(i)) throw new IllegalArgumentException(
        s"bq_asym: null element at index $i")
      val qi = if (qFloat) q.getFloat(i).toDouble else q.getDouble(i)
      val bit = ((if (i < 32) w0 else w1) >> (i % 32)) & 1L
      val sgn = if (qi > 0.0) 1L else 0L
      if (bit != sgn) acc += Math.round(Math.abs(qi) * 1e6)
      i += 1
    }
    acc
  }

  private[functions] def floatArray(t: DataType): Option[Boolean] =
    t match {
      case ArrayType(FloatType, _) => Some(true)
      case ArrayType(DoubleType, _) => Some(false)
      case _ => None
    }
}

/** bq_pack(v, off): BIGINT word of the 32 sign bits at [off, off+32). */
case class BqPack(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (BqKernels.floatArray(left.dataType).isDefined &&
        right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bq_pack expects (array<float|double>, int), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  private def vFloat = BqKernels.floatArray(left.dataType).get

  override def nullSafeEval(v: Any, off: Any): Any =
    BqKernels.pack(v.asInstanceOf[ArrayData], vFloat,
      off.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, off) =>
      s"${ev.value} = graft.functions.BqKernels.pack($v, $vFloat, $off);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)

  override def prettyName: String = "bq_pack"
}

object BqPack {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bq_pack",
      (exprs: Seq[Expression]) => BqPack(exprs(0), exprs(1)),
      "built-in")
}

/** bq_asym(w0, w1, qv): BIGINT asymmetric micro-unit score. */
case class BqAsymScore(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == LongType && second.dataType == LongType &&
        BqKernels.floatArray(third.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bq_asym expects (bigint, bigint, array<float|double>), got " +
        s"(${first.dataType.catalogString}, " +
        s"${second.dataType.catalogString}, " +
        s"${third.dataType.catalogString})")

  private def qFloat = BqKernels.floatArray(third.dataType).get

  override def nullSafeEval(w0: Any, w1: Any, q: Any): Any =
    BqKernels.asym(w0.asInstanceOf[Long], w1.asInstanceOf[Long],
      q.asInstanceOf[ArrayData], qFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w0, w1, q) =>
      s"${ev.value} = graft.functions.BqKernels.asym($w0, $w1, $q, $qFloat);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(newFirst, newSecond, newThird)

  override def prettyName: String = "bq_asym"
}

object BqAsymScore {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bq_asym",
      (exprs: Seq[Expression]) =>
        BqAsymScore(exprs(0), exprs(1), exprs(2)),
      "built-in")
}
