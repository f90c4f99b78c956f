package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic corpus sampling — the subsampling primitive a
  * training-data pipeline needs to be REPRODUCIBLE: hash-threshold
  * selection (keep a row iff a hash of its key falls under the rate
  * threshold) instead of RNG sampling. Properties that matter at 100 TB:
  *
  *   - stable: the same row is in or out regardless of partitioning,
  *     executor count, row order, or reruns (no RNG state);
  *   - shard-consistent: any subset of shards yields the sample's
  *     restriction to those shards — samples of shards union to the
  *     sample of the union;
  *   - scan-local: the predicate evaluates per-row with zero shuffles
  *     and pushes nothing more than a projection to the scan.
  *
  * The hash is the first 4 hex digits of md5(key) ∈ [0, 65536): rate r
  * keeps rows with hash < r·65536 — mirrored digit-for-digit in the
  * DuckDB oracle.
  */
object Sampling {

  val HashSpace = 65536 // 4 hex digits

  /** Per-row keep/drop column for rate `r` on the given key column. */
  def hashKeep(key: org.apache.spark.sql.Column, rate: Double) =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int") <
      lit((rate * HashSpace).toInt)

  /** Stratified sample summary: the ~rate sample of documents with
    * per-language counts/statistics (summary keeps the registered
    * query's output small; the underlying sample is row-level). */
  def sampleSummary(spark: SparkSession, dir: String,
      rate: Double): DataFrame =
    Tables.documents(spark, dir)
      .filter(hashKeep(col("doc_id"), rate))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_sampled"),
        sum(col("n_chars")).as("sampled_chars"),
        round(avg(col("n_chars")), 4).as("avg_chars"))
      .orderBy(col("lang").asc)

  def sampleSummaryOracleSql(rate: Double): String = {
    val cut = (rate * HashSpace).toInt
    s"""SELECT lang, count(*) AS n_sampled,
       |  CAST(sum(n_chars) AS BIGINT) AS sampled_chars,
       |  round(avg(n_chars), 4) AS avg_chars
       |FROM documents
       |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
       |      AS INT) < $cut
       |GROUP BY lang ORDER BY lang ASC""".stripMargin
  }
}
