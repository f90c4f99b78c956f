package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** P5: the reference's sliding-window document chunker, semantics ported
  * exactly from /root/reference/src/core/document_processor.py:48-136
  * (re-implemented in Scala from the observed behavior, not translated
  * code):
  *
  *  - empty/blank content → no chunks                       (:58-59)
  *  - overlap clamped to chunk_size / 2                     (:65)
  *  - end = min(start + size, len); if end < len, snap back ≤100 chars
  *    to just AFTER the nearest of ' \n\t.,;:!?'            (:81-86,126-136)
  *  - chunk content is stripped; empty-after-strip chunks are skipped
  *    without consuming a chunk_index                       (:89-92,106)
  *  - stop at end >= len; advance start = end - overlap; break if start
  *    fails to advance (pathological no-boundary inputs)    (:109-121)
  *  - safety cap of 1000 iterations                         (:71-77)
  *
  * The per-document computation is inherently sequential (each chunk's
  * start depends on the previous end), so the Spark shape is a typed
  * flatMap over Dataset[DocRow] — documents parallelize perfectly even
  * though chunks within one document do not. This is the same shape a
  * custom Catalyst Generator would lower to; flatMap keeps it simple
  * and fully spillable.
  */
object Chunker {

  case class Chunk(
      content: String, chunkIndex: Int, startChar: Int, endChar: Int,
      chunkSize: Int, isFirst: Boolean, isLast: Boolean)

  private val BoundaryChars: Set[Char] = " \n\t.,;:!?".toSet
  val MaxIterations = 1000
  val BoundaryLookback = 100

  /** Nearest word boundary at or before `position` (≤100 back); returns
    * the index just after the boundary char, or `position` if none.
    * Mirrors _find_word_boundary exactly, including its inclusive probe
    * of text(position) itself.
    */
  def findWordBoundary(text: String, position: Int): Int = {
    var i = position
    val floor = math.max(0, position - BoundaryLookback)
    while (i > floor) {
      if (BoundaryChars.contains(text.charAt(i))) return i + 1
      i -= 1
    }
    position
  }

  /** Pure chunking function — unit/property-testable in isolation. */
  def chunk(content: String, chunkSize: Int, overlap0: Int): Seq[Chunk] = {
    if (content == null || content.trim.isEmpty) return Nil
    val overlap = math.min(overlap0, chunkSize / 2)
    val n = content.length
    val out = Seq.newBuilder[Chunk]
    var start = 0
    var chunkIndex = 0
    var iteration = 0
    var done = false
    while (!done && start < n) {
      iteration += 1
      if (iteration > MaxIterations) { done = true }
      else {
        var end = math.min(start + chunkSize, n)
        if (end < n) end = findWordBoundary(content, end)
        val chunkContent = content.substring(start, end).trim
        if (chunkContent.nonEmpty) {
          out += Chunk(chunkContent, chunkIndex, start, end,
            chunkContent.length, chunkIndex == 0, end >= n)
          chunkIndex += 1
        }
        if (end >= n) done = true
        else {
          val oldStart = start
          start = end - overlap
          if (start <= oldStart) done = true
        }
      }
    }
    out.result()
  }

  case class DocRow(doc_id: Long, text: String)
  case class ChunkRow(
      doc_id: Long, chunk_index: Int, start_char: Int, end_char: Int,
      chunk_size: Int, is_first_chunk: Boolean, is_last_chunk: Boolean,
      content: String)

  /** Chunk the documents table; one output row per chunk (P5+P6+P7). */
  def chunkDocuments(
      spark: SparkSession, dir: String, chunkSize: Int,
      overlap: Int): Dataset[ChunkRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[DocRow]
      .flatMap { d =>
        chunk(d.text, chunkSize, overlap).map(c =>
          ChunkRow(d.doc_id, c.chunkIndex, c.startChar, c.endChar,
            c.chunkSize, c.isFirst, c.isLast, c.content))
      }
  }

  /** Summary view (deterministic, no raw text) for the correctness gate:
    * per-doc chunk count + coverage stats. No oracle SQL — the
    * boundary-snapping recurrence is not reasonably expressible in ANSI
    * SQL; the driver does a rows-only check, ScalaTest covers semantics.
    */
  def chunkSummary(
      spark: SparkSession, dir: String, chunkSize: Int,
      overlap: Int): DataFrame = {
    import spark.implicits._
    chunkDocuments(spark, dir, chunkSize, overlap)
      .groupBy("doc_id")
      .agg(
        org.apache.spark.sql.functions.count(col("chunk_index")).as("n_chunks"),
        org.apache.spark.sql.functions.max(col("end_char")).cast("long")
          .as("max_end"),
        org.apache.spark.sql.functions.sum(col("chunk_size")).as("total_chunk_chars"))
      .orderBy(col("doc_id").asc)
  }
}
