package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** K-means assignment kernel: squared integer distances of one
  * quantized vector against a centroid matrix, plus the argmin cluster
  * — the per-row hot loop of graft.operators.Clustering (Lloyd
  * iterations, assignment replays, the silhouette pass).
  *
  *   dists[c] = Σ_i (qa[i] − cents[c][i])²          (64-bit integer)
  *   cluster  = (min_c dists[c]·k + c) % k          (ties → lowest c)
  *
  * emitted as a (cluster BIGINT, dists ARRAY<BIGINT>) struct in ONE
  * pass. Exists as a native Catalyst `Expression` WITH `doGenCode` for
  * the same reason as [[QuantizeI8]]/[[VecDot]]: the column formulation
  * (transform over k of aggregate∘zip_with, then a second aggregate for
  * the composite-key argmin) evaluates higher-order lambdas interpreted
  * — ~k·dim closures per row — and dominated `kmeans_clusters`'
  * steady-state bench cost (r16 verdict #4; the quantize_i8 treatment).
  * Arithmetic is BIT-IDENTICAL to the former columns: same wrapping
  * 64-bit ops, and the argmin replicates the dist·k+c composite key
  * (start Long.MaxValue, fold least, % k) literally — so persisted
  * assignments and the DuckDB oracles are unchanged.
  */
case class KMeansAssign(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("dists", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "kmeans_assign expects (array<bigint>, array<array<bigint>>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(qa: Any, cents: Any): Any =
    KMeansAssign.assign(qa.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = "graft.functions.KMeansAssign"
    nullSafeCodeGen(ctx, ev,
      (qa, cents) => s"${ev.value} = $cls.assign($qa, $cents);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)

  override def prettyName: String = "kmeans_assign"
}

object KMeansAssign {

  /** Static kernel shared by interpreted eval and generated code.
    * (Named `assign`, not `eval` — the QuantizeI8 static-forwarder
    * lesson.) A centroid row shorter than qa indexes only its own
    * length, mirroring zip_with's null-padding ONLY in that internal
    * callers never produce ragged input; a session SQL caller with a
    * short centroid fails fast instead of silently zero-padding. */
  def assign(qa: ArrayData, cents: ArrayData): InternalRow = {
    val dim = qa.numElements()
    val k = cents.numElements()
    val dists = new Array[Long](k)
    var c = 0
    while (c < k) {
      val cent = cents.getArray(c)
      if (cent.numElements() != dim) throw new IllegalArgumentException(
        s"kmeans_assign: centroid $c has dim ${cent.numElements()}, " +
          s"vector has $dim")
      var acc = 0L
      var i = 0
      while (i < dim) {
        val d = qa.getLong(i) - cent.getLong(i)
        acc += d * d
        i += 1
      }
      dists(c) = acc
      c += 1
    }
    // the exact composite-key argmin of the former column formulation:
    // min over c of dists[c]·k + c, then % k (ties resolve to lowest c)
    var key = Long.MaxValue
    c = 0
    while (c < k) {
      val v = dists(c) * k + c
      if (v < key) key = v
      c += 1
    }
    val cluster = if (k == 0) Long.MaxValue else key % k
    new GenericInternalRow(
      Array[Any](cluster, new GenericArrayData(dists)))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmeans_assign",
      (exprs: Seq[Expression]) => KMeansAssign(exprs(0), exprs(1)),
      "built-in")
}
