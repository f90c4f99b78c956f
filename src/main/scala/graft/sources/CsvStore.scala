package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.Tables

/** CSV interchange — the third wire format next to parquet and JSONL
  * (graft.sources.JsonlStore): spreadsheets, BI exports, and the bulk
  * dumps ops teams actually hand over. The reference's ServiceNow
  * ingest (/root/reference/scripts/ingest_servicenow.py) consumes an
  * export format for the same reason; an engine claiming the
  * data-processing surface must round-trip tabular CSV losslessly.
  *
  * Spark-first: `DataFrameWriter.csv` / `DataFrameReader.csv` are the
  * distributed codec (shard-per-partition, line-splittable so files
  * parallelize by block). Readers pass an explicit schema — inference
  * costs an extra full pass and mis-types sparse columns at 100 TB, so
  * it is banned here (same policy as JsonlStore). Quoting/escaping are
  * left at RFC-4180 defaults so embedded delimiters and newlines
  * survive; `multiLine` stays OFF because the documents corpus is
  * single-line text and multiLine reads are NOT splittable (one file =
  * one task — a 100 TB anti-pattern to opt into only when the data
  * demands it).
  *
  * Correctness gate = the same round-trip digest shape as JsonlStore:
  * export documents to CSV shards, read back, per-language integral
  * digests vs the parquet original. Digests are integers, so summation
  * order cannot alias and any codec loss (quoting bug, dtype drift,
  * header misparse) hash-mismatches.
  */
object CsvStore {

  /** Write `df` as headered CSV shards under `path` (overwrite). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Read CSV shards with an explicit schema (inference banned). */
  def read(spark: SparkSession, schema: StructType,
      path: String): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  private val exportCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Memoized documents export: one CSV staging dir per corpus per
    * session (tmpfs scratch, removed on exit — the JsonlStore
    * lifecycle). */
  def ensureDocumentsCsv(spark: SparkSession, dir: String): String =
    exportCache.computeIfAbsent(dir, _ => {
      val shm = java.nio.file.Paths.get("/dev/shm")
      val base =
        (if (java.nio.file.Files.isWritable(shm))
          java.nio.file.Files.createTempDirectory(shm, "graft_csv_")
        else java.nio.file.Files.createTempDirectory("graft_csv_"))
          .toFile.getAbsolutePath
      sys.addShutdownHook {
        ParquetStore.deleteRecursively(java.nio.file.Paths.get(base))
      }
      write(Tables.documents(spark, dir), s"$base/documents")
      s"$base/documents"
    })

  /** The round-trip gate: per-language integral digests over the CSV
    * read-back; oracle = the same digests over the parquet original. */
  def roundTripDigest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // shared modular-digest aggregate (JsonlStore.DigestMod headroom
    // note applies: Int64 sums of 52-bit terms overflow at sf1)
    JsonlStore.digestAgg(
      read(spark, docs.schema, ensureDocumentsCsv(spark, dir)))
  }

  val roundTripDigestOracleSql: String =
    JsonlStore.roundTripDigestOracleSql
}
