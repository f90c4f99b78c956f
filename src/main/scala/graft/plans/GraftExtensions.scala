package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ChunkDocument, CoverDensityScore}

/** Session-extension packaging for the engine's custom Catalyst
  * components (the SparkSessionExtensions integration path from the
  * build brief): enable with
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * and every session — including ones the user builds themselves, SQL
  * CLIs, and thrift servers — gets the functions without any imperative
  * register() call:
  *
  *   - cover_density_score(array<array<int>>): the ts_rank_cd-analog
  *     proximity ranking Expression (whole-stage codegen)
  *   - chunk_document(text, size, overlap): the reference chunker as a
  *     Generator, composable via LATERAL VIEW / selectExpr
  *
  * No custom Rule[LogicalPlan] or SparkStrategy is injected: the survey
  * (SURVEY.md §4.2) concluded the reference surface needs none — every
  * operator lowers to built-in plans that Catalyst already optimizes.
  * This class is the hook where one would go.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cover_density_score"),
      new ExpressionInfo(classOf[CoverDensityScore].getName,
        "cover_density_score"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map("functionName" -> "cover_density_score",
            "expectedNum" -> "1", "actualNum" -> exprs.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
        CoverDensityScore(exprs.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("chunk_document"),
      new ExpressionInfo(classOf[ChunkDocument].getName, "chunk_document"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 3) throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map("functionName" -> "chunk_document",
            "expectedNum" -> "3", "actualNum" -> exprs.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
        ChunkDocument(exprs(0), exprs(1), exprs(2))
      }))
  }
}
