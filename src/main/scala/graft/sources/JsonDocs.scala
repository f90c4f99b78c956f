package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL document source — the other common training-data interchange
  * format next to parquet. One JSON object per line with the documents
  * schema (doc_id, text, lang, source, plus free-form metadata).
  *
  * Implemented as text lines + `from_json` rather than the native JSON
  * reader: the explicit schema keeps the read single-pass (no inference
  * scan), malformed lines surface as a NULL struct routed to a
  * quarantine side-channel (the P1 validation philosophy applied to the
  * wire format), and none of the native reader's _corrupt_record
  * query restrictions apply.
  *
  * At 100 TB: JSONL is line-splittable, so files parallelize by block;
  * the parse is scan-local.
  */
object JsonDocs {

  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("metadata", MapType(StringType, StringType))))

  private val ParseSchema =
    Schema.add(StructField("_malformed", StringType))

  /** Raw lines with the parsed struct; `doc._malformed` carries the raw
    * text of unparseable lines (from_json's corrupt-record channel). */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(col("value"),
        from_json(col("value"), ParseSchema,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_malformed")).as("doc"))

  /** Well-formed documents (the happy-path input to the ingest lineage).
    * Schema-level completeness (e.g. a required doc_id) is P1
    * validation's job downstream, NOT this reader's — filtering here
    * would silently drop well-formed lines with neither output nor
    * quarantine record. */
  def readValid(spark: SparkSession, path: String): DataFrame =
    readRaw(spark, path)
      .filter(col("doc").isNotNull && col("doc._malformed").isNull)
      .select(col("doc.*"))
      .drop("_malformed")

  /** The rejected side-channel: raw unparseable lines for quarantine. */
  def readCorrupt(spark: SparkSession, path: String): DataFrame =
    readRaw(spark, path)
      .filter(col("doc").isNull || col("doc._malformed").isNotNull)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value").as("raw_line"))

  /** Round-trip writer (documents → JSONL). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
