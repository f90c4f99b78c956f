package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encoder — the per-row hot loop of the PQ/IVFPQ
  * index builds and the streaming ingest path (graft.operators
  * .ProductQuant / .IvfPq): for each of the M subspaces, the argmin
  * over the codebook's NCode centers of the integer L2² distance to
  * the row's micro-unit (sub)vector, ties broken toward the LOWEST
  * code id (identical to the former fold-with-strict-less column
  * formulation, so persisted codes and the DuckDB oracles are
  * unchanged).
  *
  * Exists as a native Catalyst `Expression` WITH `doGenCode` because
  * the equivalent higher-order-function pipeline (aggregate over
  * sequence × zip_with per code) is interpreted per element: encoding
  * one 64-dim vector evaluates ~4k lambda closures, which made the
  * streamed re-encode ~15× slower than this single generated loop.
  * The codebook rides as a FOLDABLE literal child: evaluated once at
  * plan time, attached to generated code via `addReferenceObj`, so the
  * per-row work is just M·NCode·Dsub long multiply-adds.
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _),
            ArrayType(ArrayType(ArrayType(LongType, _), _), _))
          if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "pq_encode expects (array<bigint>, foldable " +
          s"array<array<array<bigint>>>), got $other")
    }

  /** The codebook literal materialized once as [s][c][sd] — shared by
    * interpreted eval and (as a codegen reference object) generated
    * code. */
  @transient private lazy val cb: Array[Array[Array[Long]]] = {
    val top = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(top.numElements()) { s =>
      val mid = top.getArray(s)
      Array.tabulate(mid.numElements()) { c =>
        mid.getArray(c).toLongArray()
      }
    }
  }

  override def nullSafeEval(data: Any, codebook: Any): Any =
    PqEncode.encode(data.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "long[][][]")
    val cls = "graft.functions.PqEncode"
    nullSafeCodeGen(ctx, ev,
      (d, _) => s"${ev.value} = $cls.encode($d, $cbRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)

  override def prettyName: String = "pq_encode"
}

object PqEncode {

  /** Static encoder shared by interpreted eval and generated code.
    * Registered session-wide, so a data vector shorter than the
    * codebook's M·Dsub span fails fast instead of reading past the
    * array (UnsafeArrayData would silently return garbage). */
  def encode(q: ArrayData, cb: Array[Array[Array[Long]]]): ArrayData = {
    val m = cb.length
    val need = if (m == 0) 0 else m * cb(0)(0).length
    if (q.numElements() < need) throw new IllegalArgumentException(
      s"pq_encode: vector has ${q.numElements()} dims, codebook spans $need")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val centers = cb(s)
      val dsub = centers(0).length
      val base = s * dsub
      var best = 0
      var bestd = Long.MaxValue
      var c = 0
      while (c < centers.length) {
        val cw = centers(c)
        var d = 0L
        var i = 0
        while (i < dsub) {
          val diff = q.getLong(base + i) - cw(i)
          d += diff * diff
          i += 1
        }
        if (d < bestd) { bestd = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode",
      (exprs: Seq[Expression]) => PqEncode(exprs(0), exprs(1)),
      "built-in")
}
