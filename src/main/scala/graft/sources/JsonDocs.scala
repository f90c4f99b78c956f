package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL document source — the other common training-data interchange
  * format next to parquet. One JSON object per line with the documents
  * schema (doc_id, text, lang, source, plus free-form metadata); an
  * explicit schema keeps the read single-pass (no inference scan) and
  * `_corrupt_record` capture routes malformed lines to a side channel
  * instead of failing the batch (PERMISSIVE mode — the P1 validation
  * philosophy applied to the wire format).
  *
  * At 100 TB: JSONL is line-splittable, so files parallelize by block;
  * the explicit schema avoids the full inference pre-pass Spark would
  * otherwise run.
  */
object JsonDocs {

  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("metadata", MapType(StringType, StringType)),
    StructField("_corrupt_record", StringType)))

  /** Read documents from JSONL; malformed lines yield a row with only
    * `_corrupt_record` set. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Valid documents only (the happy-path input to the ingest lineage). */
  def readValid(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .filter(col("_corrupt_record").isNull && col("doc_id").isNotNull)
      .drop("_corrupt_record")

  /** The rejected side-channel: raw corrupt lines for quarantine.
    * (Spark disallows querying only `_corrupt_record` straight off the
    * raw source — the parsed result must be materialized first.) */
  def readCorrupt(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .cache()
      .filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))

  /** Round-trip writer (documents → JSONL). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
