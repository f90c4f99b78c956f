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
  * Also injects the AsOfJoinStrategy planner strategy for the native
  * AS-OF JOIN operator (graft.plans.AsOfJoinPlan/AsOfJoinExec) — the
  * one place the engine goes beyond built-in plans; everything else
  * lowers to operators Catalyst already optimizes (SURVEY.md §4.2).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // custom-operator chain: the native AS-OF JOIN physical operator
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
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
