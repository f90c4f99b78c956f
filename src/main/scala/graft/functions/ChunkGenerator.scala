package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Chunker

/** P5 v2: the reference chunker as a custom Catalyst `Generator` (the
  * explode/UDTF analog, SURVEY.md §4.2 custom-component ledger), so
  * chunking composes inside SQL and the DataFrame DSL:
  *
  *   SELECT doc_id, c.* FROM docs
  *   LATERAL VIEW chunk_document(text, 1000, 200) c
  *
  * Delegates to the same pure `Chunker.chunk` the typed-flatMap path
  * uses, so both paths stay bit-identical (asserted in ChunkGeneratorSpec).
  * CodegenFallback matches Spark's own posexplode-class generators for
  * the non-codegen'd generate path.
  */
case class ChunkDocument(text: Expression, chunkSize: Expression,
    overlap: Expression)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, chunkSize, overlap)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_index", IntegerType, nullable = false),
    StructField("start_char", IntegerType, nullable = false),
    StructField("end_char", IntegerType, nullable = false),
    StructField("chunk_size", IntegerType, nullable = false),
    StructField("is_first_chunk", BooleanType, nullable = false),
    StructField("is_last_chunk", BooleanType, nullable = false),
    StructField("content", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && chunkSize.dataType == IntegerType &&
      overlap.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "chunk_document expects (string, int, int)")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) return Nil
    val size = chunkSize.eval(input).asInstanceOf[Int]
    val over = overlap.eval(input).asInstanceOf[Int]
    Chunker.chunk(t.toString, size, over).map { c =>
      InternalRow(c.chunkIndex, c.startChar, c.endChar, c.chunkSize,
        c.isFirst, c.isLast, UTF8String.fromString(c.content))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), chunkSize = newChildren(1),
      overlap = newChildren(2))

  override def prettyName: String = "chunk_document"
}

object ChunkDocument {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "chunk_document",
      (exprs: Seq[Expression]) =>
        ChunkDocument(exprs(0), exprs(1), exprs(2)),
      "built-in")
}
