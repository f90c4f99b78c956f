package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Change-data-capture merge — the corpus-maintenance operation between
  * the reference's insert sink and delete sink (SURVEY.md §2.1 S4/S5;
  * /root/reference/src/core/vector_store.py insert/delete paths): apply
  * a change batch (updates + inserts + deletes) to a base corpus and
  * read back the merged state, i.e. the merge-on-read a re-ingest
  * produces without rewriting the base table.
  *
  * Semantics: latest version wins per doc_id; deletes apply LAST (a doc
  * that is both updated and deleted in the batch ends deleted — the
  * reference's delete endpoint has the same last-word behavior, it
  * removes whatever is current).
  *
  * Scale shape: version resolution is ONE partial-aggregable shuffle
  * keyed by doc_id (`max_by` — map-side combine keeps one winner per
  * key per task, so the exchange carries O(distinct keys), not
  * O(base + delta)). The delete set is a change-batch-sized dimension —
  * broadcast anti-join; a corpus-scale purge would swap in a shuffled
  * anti-join on the same key, already co-partitioned with the winner
  * aggregate. The change batch here is derived deterministically from
  * the fixture (every 10th doc revised, every 25th re-inserted under a
  * shifted id, every 17th deleted) so both engines construct the
  * identical delta.
  */
object Cdc {

  /** Winning row per doc after the change batch, minus deletions:
    * (doc_id, version, source, content_sig). The content signature is
    * an md5 prefix of the WINNING text — proof of which version's
    * content survived, without hauling text through the gate. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = docs.select(col("doc_id"), col("source"), col("text"),
      lit(1L).as("version"))
    val upd = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("source"),
        concat(col("text"), lit(" [rev]")).as("text"),
        lit(2L).as("version"))
    val ins = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
        col("text"), lit(2L).as("version"))
    val del = docs.filter(col("doc_id") % 17 === 0).select(col("doc_id"))
    base.unionByName(upd).unionByName(ins)
      .groupBy("doc_id")
      .agg(
        max(col("version")).as("version"),
        expr("max_by(source, version)").as("source"),
        substring(md5(expr("max_by(text, version)")), 1, 8)
          .as("content_sig"))
      .join(broadcast(del), Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id").asc)
  }

  /** Logical batch timestamps (epoch seconds): the base load and the
    * change batch one day later. Deterministic stand-ins for the
    * reference trigger's now() — an engine gated on bit-equal oracles
    * cannot stamp wall-clock time. */
  val BaseTs = 1700000000L
  val BatchTs = 1700086400L

  /** `created_at`/`updated_at` maintenance on the merge path — the
    * reference keeps these columns with a DB trigger that bumps
    * updated_at on every UPDATE (/root/reference/scripts/init-db.sql:36-49).
    * Re-expressed for merge-on-read: created_at = the timestamp of the
    * row's FIRST version (min ts), updated_at = the timestamp of the
    * WINNING version (max_by ts version) — so never-updated rows keep
    * updated_at = created_at, updated rows are bumped to the batch
    * time, and fresh inserts get both stamps equal to the batch time;
    * exactly the trigger's observable behavior. Same single
    * partial-aggregable shuffle as [[mergeUpsert]] — the stamps ride
    * the existing doc_id aggregate for free. */
  def mergeTimestamps(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = docs.select(col("doc_id"), col("source"),
      lit(1L).as("version"), lit(BaseTs).as("ts"))
    val upd = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("source"),
        lit(2L).as("version"), lit(BatchTs).as("ts"))
    val ins = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
        lit(2L).as("version"), lit(BatchTs).as("ts"))
    val del = docs.filter(col("doc_id") % 17 === 0).select(col("doc_id"))
    base.unionByName(upd).unionByName(ins)
      .groupBy("doc_id")
      .agg(
        max(col("version")).as("version"),
        min(col("ts")).as("created_at"),
        expr("max_by(ts, version)").as("updated_at"))
      .join(broadcast(del), Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id").asc)
  }

  val mergeTimestampsOracleSql: String =
    s"""WITH base AS (
      |  SELECT doc_id, 1 AS version, $BaseTs AS ts FROM documents
      |), upd AS (
      |  SELECT doc_id, 2 AS version, $BatchTs AS ts
      |  FROM documents WHERE doc_id % 10 = 0
      |), ins AS (
      |  SELECT doc_id + 1000000 AS doc_id, 2 AS version, $BatchTs AS ts
      |  FROM documents WHERE doc_id % 25 = 0
      |), allrows AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM upd
      |  UNION ALL SELECT * FROM ins
      |), won AS (
      |  SELECT doc_id, CAST(max(version) AS BIGINT) AS version,
      |    CAST(min(ts) AS BIGINT) AS created_at,
      |    CAST(arg_max(ts, version) AS BIGINT) AS updated_at
      |  FROM allrows GROUP BY doc_id
      |)
      |SELECT doc_id, version, created_at, updated_at FROM won
      |WHERE NOT EXISTS (SELECT 1 FROM documents d
      |                  WHERE d.doc_id % 17 = 0
      |                    AND d.doc_id = won.doc_id)
      |ORDER BY doc_id ASC""".stripMargin

  val mergeUpsertOracleSql: String =
    """WITH base AS (
      |  SELECT doc_id, source, text, 1 AS version FROM documents
      |), upd AS (
      |  SELECT doc_id, source, text || ' [rev]' AS text, 2 AS version
      |  FROM documents WHERE doc_id % 10 = 0
      |), ins AS (
      |  SELECT doc_id + 1000000 AS doc_id, source, text, 2 AS version
      |  FROM documents WHERE doc_id % 25 = 0
      |), allrows AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM upd
      |  UNION ALL SELECT * FROM ins
      |), won AS (
      |  SELECT doc_id, CAST(max(version) AS BIGINT) AS version,
      |    arg_max(source, version) AS source,
      |    substr(md5(arg_max(text, version)), 1, 8) AS content_sig
      |  FROM allrows GROUP BY doc_id
      |)
      |SELECT doc_id, version, source, content_sig FROM won
      |WHERE NOT EXISTS (SELECT 1 FROM documents d
      |                  WHERE d.doc_id % 17 = 0
      |                    AND d.doc_id = won.doc_id)
      |ORDER BY doc_id ASC""".stripMargin

  /** SCD TYPE-2 history — the dimension-table discipline built from
    * the same change batch [[mergeUpsert]] merges: every version keeps
    * a row with a validity interval (valid_from = its version,
    * valid_to = the NEXT version or NULL while open) and a current
    * flag; a delete CLOSES the open interval without emitting a row
    * (is_current = 0 for every version of a deleted doc). Restricted
    * to docs the batch actually touched, so the history is the
    * interesting rows, not a copy of the corpus.
    *
    * One doc-keyed window (lead over version) on the versioned union —
    * the partitioning a dimension table already has; the delete set is
    * a broadcast-scale flag join. */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val touched = docs
      .filter(col("doc_id") % 10 === 0 || col("doc_id") % 17 === 0)
    val v1 = touched.select(col("doc_id"), col("text"),
      lit(1L).as("version"))
    val v2 = touched.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        concat(col("text"), lit(" [rev]")).as("text"),
        lit(2L).as("version"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("version").asc)
    v1.unionByName(v2)
      .withColumn("valid_to", lead(col("version"), 1).over(byDoc))
      .withColumn("deleted", (col("doc_id") % 17 === 0).cast("long"))
      .select(col("doc_id"), col("version"),
        substring(md5(col("text")), 1, 8).as("content_sig"),
        col("valid_to"),
        when(col("valid_to").isNull && col("deleted") === 0L, 1L)
          .otherwise(0L).as("is_current"))
      .orderBy(col("doc_id").asc, col("version").asc)
  }

  val scd2OracleSql: String =
    """WITH touched AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE doc_id % 10 = 0 OR doc_id % 17 = 0
      |), v AS (
      |  SELECT doc_id, text, CAST(1 AS BIGINT) AS version FROM touched
      |  UNION ALL
      |  SELECT doc_id, text || ' [rev]', CAST(2 AS BIGINT)
      |  FROM touched WHERE doc_id % 10 = 0
      |), h AS (
      |  SELECT doc_id, version,
      |    substr(md5(text), 1, 8) AS content_sig,
      |    lead(version) OVER (PARTITION BY doc_id
      |                        ORDER BY version ASC) AS valid_to
      |  FROM v
      |)
      |SELECT doc_id, version, content_sig, valid_to,
      |  CAST(CASE WHEN valid_to IS NULL AND doc_id % 17 <> 0
      |       THEN 1 ELSE 0 END AS BIGINT) AS is_current
      |FROM h
      |ORDER BY doc_id ASC, version ASC""".stripMargin
}
