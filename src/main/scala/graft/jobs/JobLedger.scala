package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Oracle-gateable analytics over a batch-job ledger — the reference's
  * job-manager metrics (A4 progress %, A5 success/failure tallies, O1
  * recency-ordered listing) expressed as queries:
  *
  *   - progress_percentage = processed/total*100
  *     (/root/reference/src/core/job_manager.py:196-198)
  *   - successful/failed document tallies (:213-216)
  *   - get_all_jobs: sort by created_at desc, newest first, limit
  *     (:116-137)
  *
  * The live `JobManager` ledger is runtime state inside one JVM — not
  * something a second engine can recompute — so the GATE runs the same
  * metrics over a deterministic jobs frame derived arithmetically from
  * the orders fixture (each order stands in for one batch job; every
  * derived column is integer arithmetic both engines evaluate
  * identically). `JobManagerSpec` separately pins the live ledger's
  * semantics to these formulas.
  *
  * Scale shape: scan-local derivation; the tally is one partial-agg
  * shuffle on a 3-value key; the listing is TakeOrderedAndProject. */
object JobLedger {

  /** Deterministic jobs frame: job_id, created_at, status,
    * total_docs (1..50), processed (= total when completed, else a
    * fixed residue), failed_docs (≤ processed), succeeded. */
  def jobsFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").as("job_id"),
        col("o_orderdate").as("created_at"),
        when(col("o_orderstatus") === "F", lit("completed"))
          .when(col("o_orderstatus") === "O", lit("processing"))
          .otherwise(lit("failed")).as("status"),
        (col("o_custkey") % 50 + 1).as("total_docs"))
      .withColumn("processed",
        when(col("status") === "completed", col("total_docs"))
          .otherwise(col("job_id") % (col("total_docs") + 1)))
      .withColumn("failed_docs", col("processed") % 7)
      .withColumn("succeeded", col("processed") - col("failed_docs"))

  /** Shared SQL rendering of `jobsFrame` (DuckDB dialect). */
  private val jobsCte: String =
    """jobs AS (
      |  SELECT o_orderkey AS job_id, o_orderdate AS created_at,
      |    CASE o_orderstatus WHEN 'F' THEN 'completed'
      |         WHEN 'O' THEN 'processing' ELSE 'failed' END AS status,
      |    o_custkey % 50 + 1 AS total_docs
      |  FROM orders
      |), j AS (
      |  SELECT job_id, created_at, status, total_docs,
      |    CASE WHEN status = 'completed' THEN total_docs
      |         ELSE job_id % (total_docs + 1) END AS processed
      |  FROM jobs
      |), ledger AS (
      |  SELECT job_id, created_at, status, total_docs, processed,
      |    processed % 7 AS failed_docs,
      |    processed - processed % 7 AS succeeded
      |  FROM j
      |)""".stripMargin

  /** A4: per-job progress percentage. One int multiply + one double
    * division per row — the single identical fp op both engines
    * perform; round(4) guards the formatting boundary. */
  def jobProgress(spark: SparkSession, dir: String): DataFrame =
    jobsFrame(spark, dir)
      .select(col("job_id"), col("status"), col("total_docs"),
        col("processed"),
        round(col("processed") * 100.0 / col("total_docs"), 4)
          .as("progress_pct"))
      .orderBy(col("job_id").asc)

  val jobProgressOracleSql: String =
    s"""WITH $jobsCte
       |SELECT job_id, status, total_docs, processed,
       |  round(processed * 100.0 / total_docs, 4) AS progress_pct
       |FROM ledger ORDER BY job_id ASC""".stripMargin

  /** A5: success/failure document tallies per job status. */
  def jobTally(spark: SparkSession, dir: String): DataFrame =
    jobsFrame(spark, dir)
      .groupBy("status")
      .agg(
        count(lit(1)).as("n_jobs"),
        sum(col("succeeded")).as("n_succeeded"),
        sum(col("failed_docs")).as("n_failed"))
      .orderBy(col("status").asc)

  val jobTallyOracleSql: String =
    s"""WITH $jobsCte
       |SELECT status, count(*) AS n_jobs,
       |  CAST(sum(succeeded) AS BIGINT) AS n_succeeded,
       |  CAST(sum(failed_docs) AS BIGINT) AS n_failed
       |FROM ledger GROUP BY status ORDER BY status ASC""".stripMargin

  /** O1: newest jobs first (get_all_jobs ordering), job_id tiebreak. */
  def jobsRecent(spark: SparkSession, dir: String, limit: Int): DataFrame =
    jobsFrame(spark, dir)
      .select(col("job_id"),
        date_format(col("created_at"), "yyyy-MM-dd").as("created_day"),
        col("status"),
        round(col("processed") * 100.0 / col("total_docs"), 4)
          .as("progress_pct"))
      .orderBy(col("created_day").desc, col("job_id").desc)
      .limit(limit)

  def jobsRecentOracleSql(limit: Int): String =
    s"""WITH $jobsCte
       |SELECT job_id, strftime(created_at, '%Y-%m-%d') AS created_day,
       |  status,
       |  round(processed * 100.0 / total_docs, 4) AS progress_pct
       |FROM ledger
       |ORDER BY created_day DESC, job_id DESC LIMIT $limit""".stripMargin
}
