package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference README's ALTERNATE table shapes, mapped as thin views
  * over the canonical documents frame — `embeddings(id, doc_id, source,
  * doc_type, title, content, metadata, …)` and `documentation(id,
  * doc_id, title, content, doc_type, metadata, …)`
  * (/root/reference/README.md:66-89), the schema the reference's ops
  * scripts query directly (README.md:360-367). SURVEY §1.1 scopes these
  * out as non-canonical; this closes the documented surface gap so a
  * user of those scripts has the same relations to point at.
  *
  * Mapping notes: `doc_id` becomes the VARCHAR unique key ("doc_<id>"),
  * `title` is the first four words of the content (deterministic — the
  * fixture has no title column), `metadata` is the JSONB analog as a
  * canonical JSON string, and the serial timestamps are emitted as
  * deterministic BIGINT epoch seconds derived from the id (the DDL's
  * CURRENT_TIMESTAMP default is nondeterministic by nature). All
  * scan-local projections — no shuffle, fully pushdown-friendly.
  */
object LegacySchema {

  private val Epoch = 1704067200L // 2024-01-01T00:00:00Z

  /** The README `embeddings` table shape over documents. */
  def embeddingsView(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("id"),
      concat(lit("doc_"), col("doc_id")).as("doc_id"),
      col("source"),
      lit("text").as("doc_type"),
      concat_ws(" ", slice(split(col("text"), " "), 1, 4)).as("title"),
      col("text").as("content"),
      concat(lit("{\"lang\":\""), col("lang"),
        lit("\",\"n_chars\":"), col("n_chars"), lit("}")).as("metadata"),
      (lit(Epoch) + col("doc_id")).as("created_at_sec"),
      (lit(Epoch) + col("doc_id")).as("updated_at_sec"))
      .orderBy(col("id").asc)

  def embeddingsViewOracleSql: String =
    s"""SELECT doc_id AS id,
       |  'doc_' || doc_id AS doc_id,
       |  source,
       |  'text' AS doc_type,
       |  array_to_string(list_slice(string_split(text, ' '), 1, 4), ' ')
       |    AS title,
       |  text AS content,
       |  '{"lang":"' || lang || '","n_chars":' || n_chars || '}'
       |    AS metadata,
       |  $Epoch + doc_id AS created_at_sec,
       |  $Epoch + doc_id AS updated_at_sec
       |FROM documents ORDER BY id ASC""".stripMargin

  /** The README `documentation` table shape: the technical-doc subset
    * (source = src0 plays the role), title mandatory. */
  def documentationView(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("source") === lit("src0"))
      .select(
        col("doc_id").as("id"),
        concat(lit("doc_"), col("doc_id")).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 4)).as("title"),
        col("text").as("content"),
        lit("guide").as("doc_type"),
        concat(lit("{\"lang\":\""), col("lang"), lit("\"}"))
          .as("metadata"),
        (lit(Epoch) + col("doc_id")).as("created_at_sec"))
      .orderBy(col("id").asc)

  def documentationViewOracleSql: String =
    s"""SELECT doc_id AS id,
       |  'doc_' || doc_id AS doc_id,
       |  array_to_string(list_slice(string_split(text, ' '), 1, 4), ' ')
       |    AS title,
       |  text AS content,
       |  'guide' AS doc_type,
       |  '{"lang":"' || lang || '"}' AS metadata,
       |  $Epoch + doc_id AS created_at_sec
       |FROM documents WHERE source = 'src0' ORDER BY id ASC""".stripMargin
}
