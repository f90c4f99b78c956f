package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** F4 v2: cover-density ranking — the `ts_rank_cd(tsv, query, 32)` analog
  * (/root/reference/src/core/vector_store.py:218), after Clarke, Cormack
  * & Tudhope, "Relevance Ranking for One to Three Term Queries" (IP&M 36,
  * 2000) — the algorithm family Postgres documents for ts_rank_cd.
  *
  * Input: array<array<int>> — one entry per query term, each the sorted
  * token positions of that term in the document. Sweep all (position,
  * term) events in order; each minimal window containing every term (a
  * "cover") contributes q/width; the summed rank gets the reference's
  * normalization 32: score = s / (1 + s). A document missing any term
  * scores 0 (AND semantics).
  *
  * Implemented as a native Catalyst `Expression` WITH `doGenCode` (the
  * generated code calls the static scorer) so it stays inside
  * whole-stage codegen instead of breaking the pipeline like a Scala UDF.
  */
case class CoverDensityScore(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(ArrayType(IntegerType, _), _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cover_density_score expects array<array<int>>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(v: Any): Any =
    CoverDensityScore.score(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = "graft.functions.CoverDensityScore"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.score($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "cover_density_score"
}

object CoverDensityScore {

  /** Static scorer shared by interpreted eval and generated code.
    * positionLists(i) = sorted positions of query term i; any missing
    * term (empty/null list) ⇒ no cover ⇒ score 0. */
  def score(positionLists: ArrayData): Double = {
    val q = positionLists.numElements()
    if (q == 0) return 0.0
    val lists = Array.tabulate(q) { i =>
      if (positionLists.isNullAt(i)) Array.emptyIntArray
      else positionLists.getArray(i).toIntArray()
    }
    if (lists.exists(_.isEmpty)) return 0.0
    if (q == 1) {
      val s = lists(0).length.toDouble // each occurrence: width-1 cover
      return s / (1.0 + s)
    }
    val events = lists.zipWithIndex
      .flatMap { case (ps, t) => ps.map(p => (p, t)) }
      .sortBy(_._1)
    val latest = Array.fill(q)(-1)
    var seen = 0
    var s = 0.0
    var lastStart = -1
    events.foreach { case (p, t) =>
      if (latest(t) < 0) seen += 1
      latest(t) = p
      if (seen == q) {
        val start = latest.min
        if (start != lastStart) { // a new minimal cover ending here
          s += q.toDouble / (p - start + 1)
          lastStart = start
        }
      }
    }
    s / (1.0 + s)
  }

  /** Register as a SQL function: cover_density_score(array<array<int>>).
    * Usable from both the DataFrame API (expr) and spark.sql. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cover_density_score",
      (exprs: Seq[Expression]) => CoverDensityScore(exprs.head),
      "built-in")
}
