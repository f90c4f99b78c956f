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

  /** The full chunk rows as a gated query (every column, including
    * content). */
  def chunkRows(spark: SparkSession, dir: String, chunkSize: Int,
      overlap: Int): DataFrame = {
    chunkDocuments(spark, dir, chunkSize, overlap).toDF()
      .select(col("doc_id"),
        col("chunk_index").cast("long").as("chunk_index"),
        col("start_char").cast("long").as("start_char"),
        col("end_char").cast("long").as("end_char"),
        col("chunk_size").cast("long").as("chunk_size"),
        col("is_first_chunk"), col("is_last_chunk"), col("content"))
      .orderBy(col("doc_id").asc, col("chunk_index").asc)
  }

  /** Oracle for the FULL boundary-snapping recurrence: a recursive CTE
    * that advances one (start, chunk_index, iteration) state per doc
    * per step — the exact loop of `chunk` above in SQL. The boundary
    * snap is `list_max` over the probe window [end-100, end] (0-based
    * probe i ∈ (floor, position], inclusive of position, +1 past the
    * boundary char — mirroring findWordBoundary exactly); empty-after-
    * trim chunks are emitted by the state walk but filtered out of the
    * result WITHOUT consuming a chunk_index, exactly like the Scala
    * path. The trim set mirrors String.trim's "<= U+0020" rule for
    * every whitespace byte the corpus can contain. */
  def chunkRowsOracleSql(chunkSize: Int, overlap0: Int): String = {
    val overlap = math.min(overlap0, chunkSize / 2)
    val bset = "(' ', chr(10), chr(9), '.', ',', ';', ':', '!', '?')"
    val ws = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
    // end-of-chunk for state start column `s` (0-based): min(s+size, n),
    // snapped back to just after the nearest boundary char when < n
    def ed(s: String) =
      s"""CASE WHEN least($s + $chunkSize, n) < n
         |  THEN coalesce(
         |    list_max(list_filter(
         |      range(greatest(least($s + $chunkSize, n) - $BoundaryLookback,
         |                     0) + 1,
         |            least($s + $chunkSize, n) + 1),
         |      i -> substr(text, i + 1, 1) IN $bset)) + 1,
         |    least($s + $chunkSize, n))
         |  ELSE n END""".stripMargin.replace("\n", " ").replaceAll(" +", " ")
    s"""WITH RECURSIVE st(doc_id, text, n, s, idx, iter) AS (
       |  SELECT doc_id, text, length(text), 0, 0, 1 FROM documents
       |  WHERE length(trim(text, $ws)) > 0
       |  UNION ALL
       |  SELECT doc_id, text, n,
       |    t.e - $overlap,
       |    idx + CASE WHEN length(trim(substr(text, s + 1, t.e - s),
       |                              $ws)) > 0
       |               THEN 1 ELSE 0 END,
       |    iter + 1
       |  FROM (SELECT st.*, ${ed("s")} AS e FROM st) t
       |  WHERE t.e < n
       |    AND t.e - $overlap > s
       |    AND iter < $MaxIterations
       |), sel AS (
       |  SELECT doc_id, idx, s, e, n,
       |    trim(substr(text, s + 1, e - s), $ws) AS content
       |  FROM (SELECT st.*, ${ed("s")} AS e FROM st) t
       |)
       |SELECT doc_id, CAST(idx AS BIGINT) AS chunk_index,
       |  CAST(s AS BIGINT) AS start_char, CAST(e AS BIGINT) AS end_char,
       |  CAST(length(content) AS BIGINT) AS chunk_size,
       |  idx = 0 AS is_first_chunk, e >= n AS is_last_chunk, content
       |FROM sel WHERE length(content) > 0
       |ORDER BY doc_id ASC, chunk_index ASC""".stripMargin
  }

  /** Oracle for the summary: aggregate the same recursive-CTE rows. */
  def chunkSummaryOracleSql(chunkSize: Int, overlap0: Int): String =
    s"""WITH rows_gated AS (${chunkRowsOracleSql(chunkSize, overlap0)})
       |SELECT doc_id, count(*) AS n_chunks,
       |  CAST(max(end_char) AS BIGINT) AS max_end,
       |  CAST(sum(chunk_size) AS BIGINT) AS total_chunk_chars
       |FROM rows_gated GROUP BY doc_id ORDER BY doc_id ASC""".stripMargin

  /** Summary view (deterministic, no raw text): per-doc chunk count +
    * coverage stats over the same rows `chunkRows` gates. */
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

  // ---- content-defined chunking (Rabin-style rolling hash) ----

  /** Rolling-hash window width and the per-offset coefficient 31^(w-1-k)
    * — small enough that window·maxAscii·31^7 stays far inside BIGINT,
    * so the hash is exact integer arithmetic on both engines. */
  val CdcWindow = 8
  private val CdcPowers: Seq[Long] =
    (0 until CdcWindow).map(k => math.pow(31, CdcWindow - 1 - k).toLong)

  /** Content-defined chunk boundaries (the storage-dedup chunker:
    * Rabin/Gear CDC, here a polynomial rolling hash with divisor
    * `divisor` ⇒ expected chunk ≈ divisor chars). A position ends a
    * chunk iff the hash of the trailing `CdcWindow` chars ≡ 0 (mod
    * divisor). Boundaries depend only on LOCAL content — the property
    * that makes CDC dedup shift-robust AND makes this embarrassingly
    * parallel: no min/max-length state chain, every document (or file
    * split) chunks independently, scan-local. Returns the per-source
    * rollup: docs, chunks, integral mean chunk size. */
  def cdcChunks(spark: SparkSession, dir: String, divisor: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val chars = split(col("text"), "")
    val n = length(col("text"))
    val hashAt = (i: org.apache.spark.sql.Column) =>
      CdcPowers.zipWithIndex.map { case (p, k) =>
        ascii(element_at(chars, i - (CdcWindow - 1) + k)) * lit(p)
      }.reduce(_ + _)
    val bounds = when(n >= CdcWindow,
      filter(sequence(lit(CdcWindow), n), i => hashAt(i) % divisor === 0))
      .otherwise(array().cast("array<int>"))
    graft.Tables.documents(spark, dir)
      .select(col("source"), n.cast("long").as("n_chars"),
        (size(bounds) + 1).cast("long").as("n_chunks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chunks")).as("total_chunks"),
        expr("sum(n_chars) div sum(n_chunks)").as("avg_chunk_chars"))
      .orderBy(col("source").asc)
  }

  def cdcChunksOracleSql(divisor: Int): String = {
    val pows = CdcPowers.mkString("[", ", ", "]")
    val w = CdcWindow
    s"""WITH cd AS (
       |  SELECT source, len(text) AS n_chars,
       |    1 + CASE WHEN len(text) >= $w THEN
       |      len(list_filter(range($w, len(text) + 1), i ->
       |        (list_sum(list_transform(range(0, $w), k ->
       |          ascii(text[i - ${w - 1} + k]) * $pows[k + 1]))
       |         % $divisor) = 0))
       |    ELSE 0 END AS n_chunks
       |  FROM documents
       |)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_chunks) AS BIGINT) AS total_chunks,
       |  CAST(sum(n_chars) // sum(n_chunks) AS BIGINT) AS avg_chunk_chars
       |FROM cd GROUP BY source ORDER BY source ASC""".stripMargin
  }
}
