package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The document ingest pipeline's validation/preprocess/metadata stages
  * (SURVEY.md §2.4 P1/P3/P4), ported semantics-exactly from
  * /root/reference/src/core/document_processor.py:138-253, including its
  * quirks:
  *
  *  - P3 preprocess: `' '.join(content.split())` collapses ALL whitespace
  *    (newlines included) to single spaces BEFORE the line-based steps,
  *    making them no-ops (:245-251). Python's str.split() whitespace also
  *    covers \x1c-\x1f and \x85 (Java's \s does not), and step 3 (:251)
  *    then strips any remaining control char with ord<32 — so the composed
  *    function is "collapse [\s\x1c-\x1f\x85]+ to one space, strip
  *    [\x00-\x08\x0e-\x1b], trim" and we implement exactly that.
  *  - P4 title: an extracted-but-empty title is falsy in Python
  *    (`if title:` :164), so a found-but-blank markdown/html title yields
  *    NO title rather than falling through to the next heuristic.
  *  - P4 content-type cascade order is code > markdown > html > text
  *    (:153-160); `SELECT`/`FROM` are case-sensitive, html indicators are
  *    checked lowercase (:169-185).
  *  - P1 validation bounds: non-blank, <= max MB (1MB = 1_000_000 bytes,
  *    :223), reserved metadata keys rejected (:233).
  *
  * All column expressions — codegen'd, no UDFs.
  */
object DocumentPipeline {

  val MaxDocumentSizeMb = 5
  val ReservedMetadataKeys: Seq[String] =
    Seq("chunk_index", "start_char", "end_char", "chunk_size")

  // ---- P3 preprocess ----------------------------------------------------

  def preprocess(c: Column): Column = trim(
    regexp_replace(
      regexp_replace(c, "[\\s\\x1c-\\x1f\\x85]+", " "),
      "[\\x00-\\x08\\x0e-\\x1b]", ""))

  /** The same composition as a DuckDB SQL fragment for oracles. */
  def preprocessSql(col: String): String =
    s"trim(regexp_replace(regexp_replace($col, " +
      s"'[\\s\\x1c-\\x1f\\x85]+', ' ', 'g'), " +
      s"'[\\x00-\\x08\\x0e-\\x1b]', '', 'g'))"

  // ---- P1 validation ----------------------------------------------------

  /** Error message or NULL (valid). Mirrors validate_document :214-238. */
  def validationError(c: Column): Column =
    when(length(trim(c)) === 0, lit("Document content cannot be empty"))
      .when(length(c) > MaxDocumentSizeMb * 1000000,
        lit(s"Document content too large (max ${MaxDocumentSizeMb}MB)"))
      .otherwise(lit(null).cast("string"))

  def validate(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        validationError(col("text")).as("error"))
      .withColumn("is_valid", col("error").isNull)
      .orderBy(col("doc_id").asc)

  val validateOracleSql: String =
    s"""SELECT doc_id,
       |  CASE WHEN length(trim(text)) = 0
       |         THEN 'Document content cannot be empty'
       |       WHEN length(text) > ${5 * 1000000}
       |         THEN 'Document content too large (max 5MB)'
       |  END AS error,
       |  CASE WHEN length(trim(text)) = 0 OR length(text) > ${5 * 1000000}
       |       THEN false ELSE true END AS is_valid
       |FROM documents ORDER BY doc_id ASC""".stripMargin

  /** P1 complete: the metadata half of validate_document
    * (/root/reference/src/core/document_processor.py:227-238) — non-dict
    * metadata is rejected ("Metadata must be a dictionary"), then the
    * reserved keys are checked IN THE REFERENCE'S FIXED ORDER
    * (chunk_index, start_char, end_char, chunk_size: the loop iterates
    * reserved_keys, so a doc carrying both start_char and chunk_size
    * reports start_char). Empty/None metadata skips the checks
    * (`if metadata:`). The documents table stores no metadata column,
    * so the fixture derives one deterministically from doc_id (same
    * derivation in the oracle): ≡1 mod 13 → none, ≡0 mod 7 → reserved
    * chunk_index, ≡2 mod 7 → two reserved keys (order check),
    * ≡3 mod 11 → non-dict, else a plain dict.
    */
  def validateWithMetadata(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val meta = when(id % 13 === 1, lit(null).cast("string"))
      .when(id % 7 === 0,
        concat(lit("{\"chunk_index\": "), (id % 5).cast("string"),
          lit(", \"a\": 1}")))
      .when(id % 7 === 2, lit("{\"start_char\": 0, \"chunk_size\": 10}"))
      .when(id % 11 === 3, lit("[\"not\", \"a\", \"dict\"]"))
      .otherwise(concat(lit("{\"source\": \""), col("source"), lit("\"}")))
    val reservedErrs = ReservedMetadataKeys.map(k =>
      when(get_json_object(col("metadata"), s"$$.$k").isNotNull,
        lit(s"Metadata key '$k' is reserved")))
    val metaErr = when(col("metadata").isNull, lit(null).cast("string"))
      .when(!trim(col("metadata")).startsWith("{"),
        lit("Metadata must be a dictionary"))
      .otherwise(coalesce(reservedErrs :+ lit(null).cast("string"): _*))
    Tables.documents(spark, dir)
      .withColumn("metadata", meta)
      .select(col("doc_id"), col("metadata"),
        coalesce(validationError(col("text")), metaErr).as("error"))
      .withColumn("is_valid", col("error").isNull)
      .orderBy(col("doc_id").asc)
  }

  val validateWithMetadataOracleSql: String = {
    // single-line fragment: embedding a stripMargin'd block inside
    // another stripMargin'd template would strip the first '|' of a
    // line-leading '||' concat
    val metaCase =
      "CASE WHEN doc_id % 13 = 1 THEN NULL " +
        "WHEN doc_id % 7 = 0 THEN '{\"chunk_index\": ' || " +
        "CAST(doc_id % 5 AS VARCHAR) || ', \"a\": 1}' " +
        "WHEN doc_id % 7 = 2 THEN '{\"start_char\": 0, \"chunk_size\": 10}' " +
        "WHEN doc_id % 11 = 3 THEN '[\"not\", \"a\", \"dict\"]' " +
        "ELSE '{\"source\": \"' || source || '\"}' END"
    val reserved = ReservedMetadataKeys.map(k =>
      s"""WHEN json_extract_string(metadata, '$$.$k') IS NOT NULL
         |      THEN 'Metadata key ''$k'' is reserved'""".stripMargin)
      .mkString("\n    ")
    s"""WITH m AS (
       |  SELECT doc_id, text, $metaCase AS metadata FROM documents
       |), v AS (
       |  SELECT doc_id, metadata,
       |    CASE WHEN length(trim(text)) = 0
       |           THEN 'Document content cannot be empty'
       |         WHEN length(text) > ${MaxDocumentSizeMb * 1000000}
       |           THEN 'Document content too large (max ${MaxDocumentSizeMb}MB)'
       |         WHEN metadata IS NULL THEN NULL
       |         WHEN NOT starts_with(trim(metadata), '{')
       |           THEN 'Metadata must be a dictionary'
       |    $reserved
       |    END AS error
       |  FROM m
       |)
       |SELECT doc_id, metadata, error, error IS NULL AS is_valid
       |FROM v ORDER BY doc_id ASC""".stripMargin
  }

  // ---- P1 embedding-dimension gate ---------------------------------------

  /** The dimension check NEITHER engine of the reference performs: the
    * schema declares a per-collection `embedding_dimension`
    * (/root/reference/src/db/models.py:19, default 384 — conflicting
    * with the 1024 default its own init script writes,
    * scripts/init-db.sql:24; Document.embedding is meanwhile hardwired
    * Vector(768), models.py:55 — THREE mutually inconsistent defaults),
    * yet inserts never compare `len(embedding)` against it, so a
    * mis-dimensioned vector is only caught when pgvector errors at
    * query time. This gate closes the contract at ingest: flag every
    * vector whose length differs from its collection's declared
    * dimension. Pure scan + broadcast dim join — one pass, no shuffle
    * beyond the final tally.
    *
    * [[validateEmbeddingDimFrame]] is the reusable core (any
    * (collection_id, embedding) frame against any (collection_id,
    * embedding_dimension) dim); the registered query runs it over the
    * fixture embeddings and [[Similarity.vectorCollections]]. */
  def validateEmbeddingDimFrame(emb: DataFrame,
      dims: DataFrame): DataFrame =
    emb.join(broadcast(dims), Seq("collection_id"))
      .withColumn("dim_ok",
        size(col("embedding")) === col("embedding_dimension"))
      .groupBy(col("collection_id"), col("embedding_dimension"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("dim_ok"), 1L).otherwise(0L)).as("n_valid"),
        sum(when(col("dim_ok"), 0L).otherwise(1L)).as("n_invalid"))
      .orderBy(col("collection_id").asc)

  def validateEmbeddingDim(spark: SparkSession, dir: String): DataFrame =
    validateEmbeddingDimFrame(
      Tables.embeddings(spark, dir)
        .select(col("label").cast("long").as("collection_id"),
          col("embedding")),
      Similarity.vectorCollections(spark, dir)
        .select("collection_id", "embedding_dimension"))

  val validateEmbeddingDimOracleSql: String =
    """SELECT CAST(label AS BIGINT) AS collection_id,
      |  64 AS embedding_dimension, count(*) AS n_vectors,
      |  CAST(sum(CASE WHEN len(embedding) = 64 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_valid,
      |  CAST(sum(CASE WHEN len(embedding) = 64 THEN 0 ELSE 1 END)
      |    AS BIGINT) AS n_invalid
      |FROM embeddings GROUP BY label ORDER BY collection_id ASC""".stripMargin

  // ---- P4 metadata extraction ------------------------------------------

  private def containsAny(c: Column, needles: Seq[String]): Column =
    needles.map(n => c.contains(lit(n))).reduce(_ || _)

  /** content-type cascade, reference :169-185 (exact indicator lists). */
  def contentType(c: Column): Column = {
    val code = containsAny(c, Seq("def ", "class ", "import ", "from ",
      "function", "#!/", "<?", "/*", "//", "<!--", "SELECT", "FROM"))
    val md = containsAny(c, Seq("# ", "## ", "### ", "**", "*", "`",
      "```", "[", "]("))
    val html = containsAny(lower(c), Seq("<html", "<div", "<p>", "<h1",
      "<h2", "<script", "<style"))
    when(code, "code").when(md, "markdown").when(html, "html")
      .otherwise("text")
  }

  /** Title heuristic, reference :187-212 — markdown heading in the first
    * 5 lines, else <title> tag, else a short first line; an empty
    * extracted string is treated as "no title" without fallback (:164).
    */
  def title(c: Column): Column = {
    val lines = split(c, "\n")
    val first5 = slice(lines, 1, 5)
    val mdLines = filter(first5, l =>
      trim(l).startsWith("# ") || trim(l).startsWith("## "))
    val mdFound = size(mdLines) > 0
    val mdTitle = trim(regexp_replace(trim(element_at(mdLines, 1)),
      "^#{1,2} ", ""))
    val hp = instr(lower(c), "<title>") // 1-based, 0 = absent
    val rest = substring(lower(c), hp + lit(7), lit(1000000))
    val ep = instr(rest, "</title>")
    val htmlFound = hp > 0 && ep > 0
    val htmlTitle = trim(substring(c, hp + lit(7), ep - lit(1)))
    val firstLine = trim(element_at(lines, 1))
    val flOk = length(firstLine) > 0 && length(firstLine) < 100 &&
      !firstLine.endsWith(".")
    nullif(
      when(mdFound, mdTitle)
        .when(htmlFound, htmlTitle)
        .when(flOk, firstLine),
      lit(""))
  }

  /** P4 in one pass: statistics + content type + title
    * (extract_metadata :138-167). */
  def extractMetadata(spark: SparkSession, dir: String): DataFrame = {
    val c = col("text")
    val words = filter(split(c, "\\s+"), w => w =!= "")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(c).cast("long").as("content_length"),
        size(words).cast("long").as("word_count"),
        (length(c) - length(regexp_replace(c, "\n", "")) + 1).cast("long")
          .as("line_count"),
        length(c).cast("long").as("char_count"),
        contentType(c).as("content_type"),
        title(c).as("title"))
      .orderBy(col("doc_id").asc)
  }

  val extractMetadataOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id, text, string_split(text, chr(10)) AS lines,
      |    strpos(lower(text), '<title>') AS hp
      |  FROM documents
      |), m AS (
      |  SELECT doc_id, text, lines, hp,
      |    list_filter(lines[1:5], l -> starts_with(trim(l), '# ')
      |      OR starts_with(trim(l), '## ')) AS mdl,
      |    CASE WHEN hp > 0
      |      THEN strpos(substr(lower(text), hp + 7), '</title>') ELSE 0
      |    END AS ep
      |  FROM t
      |)
      |SELECT doc_id,
      |  length(text) AS content_length,
      |  len(list_filter(string_split_regex(text, '\s+'), w -> w <> ''))
      |    AS word_count,
      |  length(text) - length(replace(text, chr(10), '')) + 1 AS line_count,
      |  length(text) AS char_count,
      |  CASE
      |    WHEN contains(text, 'def ') OR contains(text, 'class ')
      |      OR contains(text, 'import ') OR contains(text, 'from ')
      |      OR contains(text, 'function') OR contains(text, '#!/')
      |      OR contains(text, '<?') OR contains(text, '/*')
      |      OR contains(text, '//') OR contains(text, '<!--')
      |      OR contains(text, 'SELECT') OR contains(text, 'FROM')
      |      THEN 'code'
      |    WHEN contains(text, '# ') OR contains(text, '## ')
      |      OR contains(text, '### ') OR contains(text, '**')
      |      OR contains(text, '*') OR contains(text, '`')
      |      OR contains(text, '```') OR contains(text, '[')
      |      OR contains(text, '](')
      |      THEN 'markdown'
      |    WHEN contains(lower(text), '<html') OR contains(lower(text), '<div')
      |      OR contains(lower(text), '<p>') OR contains(lower(text), '<h1')
      |      OR contains(lower(text), '<h2') OR contains(lower(text), '<script')
      |      OR contains(lower(text), '<style')
      |      THEN 'html'
      |    ELSE 'text'
      |  END AS content_type,
      |  nullif(CASE
      |    WHEN len(mdl) > 0
      |      THEN trim(regexp_replace(trim(mdl[1]), '^#{1,2} ', ''))
      |    WHEN hp > 0 AND ep > 0
      |      THEN trim(substr(text, hp + 7, ep - 1))
      |    WHEN length(trim(lines[1])) > 0 AND length(trim(lines[1])) < 100
      |      AND NOT ends_with(trim(lines[1]), '.')
      |      THEN trim(lines[1])
      |  END, '') AS title
      |FROM m ORDER BY doc_id ASC""".stripMargin

  /** The §3.2 single-doc ingest lineage as ONE dataflow (B2's sync batch
    * shape): validate → deterministic ID → preprocess → extract metadata
    * → fixed-stride chunk → chunk IDs. What the reference runs as eight
    * sequential Python stages with commit batches and gc.collect
    * (/root/reference/src/api/documents.py:85-224) is one declarative
    * lineage here — partitioning is the memory model. */
  def ingestLineage(spark: SparkSession, dir: String, size: Int,
      overlap: Int): DataFrame = {
    val stride = size - overlap
    val c = col("text")
    // explode(array(...)) barrier: materialize the preprocessed text
    // ONCE per doc — referencing `preprocess(c)` from both the clean
    // column and the chunk-start sequence would run the regex twice
    val staged = Tables.documents(spark, dir)
      .filter(validationError(c).isNull)                          // P1
      .select(col("doc_id"), col("source"), col("text"),
        explode(array(preprocess(c))).as("clean"))                // P3
    val n = length(col("clean"))
    val starts = sequence(lit(0),
      greatest(ceil((n - lit(size)).cast("double") / stride).cast("int"),
        lit(0)))
    staged
      .select(col("doc_id"),
        substring(sha2(concat(c, lit("_source:"), col("source")), 256),
          1, 16).as("det_id"),                                    // P2
        col("clean"),
        contentType(c).as("content_type"),                        // P4
        explode(starts).as("chunk_index"))                        // P5
      .filter(col("chunk_index") * stride < length(col("clean")))
      .select(col("doc_id"), col("det_id"), col("content_type"),
        concat(col("det_id"), lit("_chunk_"), col("chunk_index"))
          .as("chunk_id"),                                        // P6
        col("chunk_index").cast("long").as("chunk_index"),
        length(substring(col("clean"), col("chunk_index") * stride + 1,
          lit(size))).cast("long").as("chunk_len"))
      .orderBy(col("doc_id").asc, col("chunk_index").asc)
  }

  def ingestLineageOracleSql(size: Int, overlap: Int): String = {
    val stride = size - overlap
    s"""WITH valid AS (
       |  SELECT doc_id, text, source,
       |    ${preprocessSql("text")} AS clean
       |  FROM documents
       |  WHERE length(trim(text)) > 0 AND length(text) <= ${5 * 1000000}
       |), staged AS (
       |  SELECT doc_id,
       |    substr(sha256(text || '_source:' || source), 1, 16) AS det_id,
       |    clean,
       |    CASE
       |      WHEN contains(text, 'def ') OR contains(text, 'class ')
       |        OR contains(text, 'import ') OR contains(text, 'from ')
       |        OR contains(text, 'function') OR contains(text, '#!/')
       |        OR contains(text, '<?') OR contains(text, '/*')
       |        OR contains(text, '//') OR contains(text, '<!--')
       |        OR contains(text, 'SELECT') OR contains(text, 'FROM')
       |        THEN 'code'
       |      WHEN contains(text, '# ') OR contains(text, '## ')
       |        OR contains(text, '### ') OR contains(text, '**')
       |        OR contains(text, '*') OR contains(text, '`')
       |        OR contains(text, '```') OR contains(text, '[')
       |        OR contains(text, '](')
       |        THEN 'markdown'
       |      WHEN contains(lower(text), '<html') OR contains(lower(text), '<div')
       |        OR contains(lower(text), '<p>') OR contains(lower(text), '<h1')
       |        OR contains(lower(text), '<h2') OR contains(lower(text), '<script')
       |        OR contains(lower(text), '<style')
       |        THEN 'html'
       |      ELSE 'text'
       |    END AS content_type
       |  FROM valid
       |)
       |SELECT doc_id, det_id, content_type,
       |  det_id || '_chunk_' || i AS chunk_id,
       |  i AS chunk_index,
       |  length(substr(clean, i * $stride + 1, $size)) AS chunk_len
       |FROM staged, LATERAL (
       |  SELECT unnest(range(0,
       |    greatest(CAST(ceil(CAST(length(clean) - $size AS DOUBLE)
       |      / $stride) AS BIGINT), 0) + 1)) AS i
       |)
       |WHERE i * $stride < length(clean)
       |ORDER BY doc_id ASC, chunk_index ASC""".stripMargin
  }

  /** P3 as a checkable query: preprocessed content with a stable digest
    * (text itself would be a huge output column; md5 keeps it exact). */
  def preprocessDigest(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(preprocess(col("text"))).cast("long").as("clean_length"),
        md5(preprocess(col("text"))).as("clean_md5"))
      .orderBy(col("doc_id").asc)

  val preprocessDigestOracleSql: String =
    s"""SELECT doc_id,
       |  length(${preprocessSql("text")}) AS clean_length,
       |  md5(${preprocessSql("text")}) AS clean_md5
       |FROM documents ORDER BY doc_id ASC""".stripMargin
}
