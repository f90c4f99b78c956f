package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** F1 stemming: the light suffix-stripper behind FTS term matching — the
  * analog of the Snowball `english` stemming the reference gets for free
  * from `plainto_tsquery('english', ...)` / the tsvector trigger
  * (/root/reference/src/core/vector_store.py:222,
  * /root/reference/src/config/settings.py:21). The rules are owned and
  * specified ONCE in `TextAnalyzer.stemOne` (Scala), with DuckDB-SQL
  * mirrors in `TextAnalyzer.sqlStemA/B/C` — this class is the Catalyst
  * rendering of the same spec so stemming runs inside whole-stage codegen
  * on the scan (no UDF serialization, no codegen break).
  *
  * ASCII-suffix logic only: rule matching is on byte tails, safe for
  * UTF-8 (multi-byte sequences never end in ASCII letter bytes).
  */
case class LightStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"light_stem expects string, got ${other.catalogString}")
    }

  override protected def nullSafeEval(v: Any): Any =
    LightStem.stem(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = "graft.functions.LightStem"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.stem($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "light_stem"
}

object LightStem {

  /** Static stemmer shared by interpreted eval and generated code.
    * MUST agree with TextAnalyzer.stemOne on every input — enforced by
    * LightStemSpec's exhaustive cross-check. */
  def stem(w: UTF8String): UTF8String = {
    val s = w.toString
    val out = graft.functions.TextAnalyzer.stemOne(s)
    if (out eq s) w else UTF8String.fromString(out)
  }

  /** Register as a SQL function: light_stem(string). Usable from both the
    * DataFrame API (call_function) and spark.sql. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "light_stem",
      (exprs: Seq[Expression]) => LightStem(exprs.head),
      "built-in")
}
