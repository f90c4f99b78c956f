package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.Tables

/** JSONL (newline-delimited JSON) interchange — the lingua franca of
  * LLM training-data pipelines (HuggingFace datasets, Dolma, RedPajama
  * all ship corpora as *.jsonl shards). The reference's API accepts and
  * emits JSON documents (/root/reference/src/api/routes.py ingest /
  * search payloads); at corpus scale that becomes bulk JSONL files, and
  * an engine claiming the data-processing surface must round-trip them
  * losslessly.
  *
  * Spark-first: `DataFrameWriter.json` / `DataFrameReader.json` ARE the
  * distributed JSONL codec (one JSON object per line, shard-per
  * -partition — exactly the sharded-corpus layout). Readers must pass
  * an explicit schema: schema inference costs an extra full pass and
  * can mis-type sparse columns at 100 TB, so it is banned here; with a
  * schema the scan is a streaming line parse with column pruning
  * (Jackson stops materializing unprojected fields).
  *
  * The correctness gate is a ROUND-TRIP digest: export documents to
  * JSONL, read it back, aggregate per-language integral digests
  * (counts, id/char sums, and a 52-bit md5 text digest summed per
  * group). The oracle computes the same digests over the PARQUET
  * original — any loss or mangling in either codec direction breaks
  * the hash. Digests are integers, so summation order cannot alias.
  */
object JsonlStore {

  /** Write `df` as JSONL shards under `path` (overwrite). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSONL shards with an explicit schema (inference is banned —
    * see object doc). */
  def read(spark: SparkSession, schema: StructType,
      path: String): DataFrame =
    spark.read.schema(schema).json(path)

  private val exportCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Memoized documents export: one JSONL staging dir per corpus per
    * session (build-once like the index ensure* family; scratch lives
    * on tmpfs and is removed on exit). */
  def ensureDocumentsJsonl(spark: SparkSession, dir: String): String =
    exportCache.computeIfAbsent(dir, _ => {
      val shm = java.nio.file.Paths.get("/dev/shm")
      val base =
        (if (java.nio.file.Files.isWritable(shm))
          java.nio.file.Files.createTempDirectory(shm, "graft_jsonl_")
        else java.nio.file.Files.createTempDirectory("graft_jsonl_"))
          .toFile.getAbsolutePath
      sys.addShutdownHook {
        ParquetStore.deleteRecursively(java.nio.file.Paths.get(base))
      }
      write(Tables.documents(spark, dir), s"$base/documents")
      s"$base/documents"
    })

  /** Digest modulus, 2⁶¹−1 (Mersenne prime). The digests are SUMS of
    * 52-bit md5-prefix terms: a raw Int64 sum overflows past ~2·10³
    * docs per group — the sf1 sweep caught exactly that (ANSI
    * ARITHMETIC_OVERFLOW at 10⁴ docs/lang). The sums therefore
    * accumulate in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB's native
    * sum(BIGINT) type) and reduce mod 2⁶¹−1 — identity whenever the
    * true sum is below the modulus, so fixture hashes at small sf are
    * unchanged, and headroom is ~10²² rows per group at 100 TB. A
    * modular sum still detects any single-row codec loss. */
  val DigestMod = 2305843009213693951L

  private[sources] def digestAgg(back: DataFrame): DataFrame = {
    def modSum(c: Column) =
      pmod(sum(c.cast("decimal(38,0)")),
        lit(new java.math.BigDecimal(DigestMod))).cast("long")
    back.groupBy("lang")
      .agg(
        count(lit(1)).as("n"),
        modSum(col("doc_id")).as("id_sum"),
        modSum(col("n_chars")).as("chars_sum"),
        modSum(conv(substring(md5(col("text")), 1, 13), 16, 10)
          .cast("long")).as("text_digest"))
      .orderBy(col("lang").asc)
  }

  /** The round-trip gate: per-language integral digests computed over
    * the JSONL read-back. Output (lang, n, id_sum, chars_sum,
    * text_digest). */
  def roundTripDigest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    digestAgg(read(spark, docs.schema, ensureDocumentsJsonl(spark, dir)))
  }

  /** Oracle: identical digests over the parquet original — the JSONL
    * leg exists only Spark-side, so any codec loss hash-mismatches. */
  val roundTripDigestOracleSql: String =
    s"""SELECT lang, count(*) AS n,
       |  CAST(sum(doc_id) % $DigestMod AS BIGINT) AS id_sum,
       |  CAST(sum(n_chars) % $DigestMod AS BIGINT) AS chars_sum,
       |  CAST(sum(CAST('0x' || substr(md5(text), 1, 13) AS BIGINT))
       |    % $DigestMod AS BIGINT) AS text_digest
       |FROM documents GROUP BY lang ORDER BY lang ASC""".stripMargin
}
