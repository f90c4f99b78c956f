package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus drift monitoring — the check a production training-data
  * pipeline runs on every refresh: has the incoming batch's
  * distribution moved against the reference corpus? The standard
  * instrument is the Population Stability Index
  * (PSI = Σ (p_new − p_ref) · ln(p_new / p_ref) over feature buckets;
  * credit-scoring lineage, now the default drift score in ML
  * monitoring stacks — <0.1 stable, 0.1–0.25 drifting, >0.25 shifted).
  *
  * Fixture framing: reference = even doc_ids, candidate = odd doc_ids
  * (a deterministic split both engines replay); feature = document
  * length (n_chars) in `nBuckets` equal-width bins over the corpus
  * [min, max] — fixed-width bins keep the edges a pure function of two
  * integers (no quantile estimation to drift between engines).
  * Laplace-smoothed counts (+1 per bucket) keep empty buckets finite —
  * the convention monitoring stacks use rather than dropping bins.
  *
  * Scale shape: ONE scan computes (half, bucket) counts (map-side
  * combinable), the [min, max] bounds ride as a 1-row broadcast, and
  * the per-bucket join is bucket-count-sized. Nothing here grows with
  * the corpus except the initial scan.
  *
  * Output: one row per bucket (bucket, n_ref, n_new, psi_contrib)
  * plus the corpus row aggregations the caller sums — contributions
  * round(…, 6) so the hash gate is exact.
  */
object Drift {

  def psi(spark: SparkSession, dir: String, nBuckets: Int): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
    val bounds = docs.agg(min(col("n_chars")).as("lo"),
      max(col("n_chars")).as("hi"))
    // equal-width bin over [lo, hi]; the hi edge folds into the last
    // bucket (least(nBuckets-1)). `div`, not `/`: Column `/` is double
    // division and DuckDB's BIGINT cast ROUNDS where Spark's truncates
    // — explicit integer division on both sides is engine-identical
    val bucketed = docs.crossJoin(broadcast(bounds))
      .select(
        least(
          expr(s"((n_chars - lo) * $nBuckets) div (hi - lo + 1)"),
          lit(nBuckets - 1L)).as("bucket"),
        (col("doc_id") % 2 === 0).as("is_ref"))
    val counts = bucketed.groupBy("bucket")
      .agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_new"))
    // Laplace +1 per bucket; totals include the smoothing mass so the
    // smoothed p's still sum to 1
    val totals = counts.agg(
      (sum(col("n_ref")) + nBuckets).as("t_ref"),
      (sum(col("n_new")) + nBuckets).as("t_new"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_ref"), col("n_new"),
        round(
          ((col("n_new") + 1).cast("double") / col("t_new") -
            (col("n_ref") + 1).cast("double") / col("t_ref")) *
            log(((col("n_new") + 1).cast("double") / col("t_new")) /
              ((col("n_ref") + 1).cast("double") / col("t_ref"))), 6)
          .as("psi_contrib"))
      .orderBy(col("bucket").asc)
  }

  def psiOracleSql(nBuckets: Int): String =
    s"""WITH d AS (
       |  SELECT doc_id, n_chars FROM documents
       |), b AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM d),
       |bucketed AS (
       |  SELECT least(((n_chars - lo) * $nBuckets) // (hi - lo + 1),
       |      ${nBuckets - 1}) AS bucket,
       |    doc_id % 2 = 0 AS is_ref
       |  FROM d, b
       |), counts AS (
       |  SELECT bucket,
       |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_ref,
       |    CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
       |      AS n_new
       |  FROM bucketed GROUP BY bucket
       |), totals AS (
       |  SELECT CAST(sum(n_ref) + $nBuckets AS BIGINT) AS t_ref,
       |         CAST(sum(n_new) + $nBuckets AS BIGINT) AS t_new
       |  FROM counts
       |)
       |SELECT bucket, n_ref, n_new,
       |  round((CAST(n_new + 1 AS DOUBLE) / t_new
       |       - CAST(n_ref + 1 AS DOUBLE) / t_ref)
       |    * ln((CAST(n_new + 1 AS DOUBLE) / t_new)
       |        / (CAST(n_ref + 1 AS DOUBLE) / t_ref)), 6) AS psi_contrib
       |FROM counts, totals ORDER BY bucket ASC""".stripMargin
}
