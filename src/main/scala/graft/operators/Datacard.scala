package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus datacard: the per-(source, lang) statistics block a training
  * run publishes alongside a dataset release (the "data card" of
  * Gebru et al. 2021, Datasheets for Datasets) — document counts,
  * exact-duplicate counts, token totals, and length distribution, all
  * in one aggregation pass.
  *
  * Scale shape: one scan + one hash-groupBy on (source, lang) — the
  * group count is tiny (sources × langs), so partial (map-side)
  * aggregation collapses nearly everything before the exchange.
  * count(DISTINCT text) rewrites to a two-phase expand-aggregate
  * keyed by (source, lang, text) — at 100 TB replace the raw text key
  * with its 128-bit hash; here the exact column keeps the oracle
  * trivially expressible. percentile() is the exact single-pass
  * implementation (sorted per-group state); groups are few so state is
  * bounded by the largest group, which is exactly what the p50 needs.
  */
object Datacard {

  private val PieceRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def corpusDatacard(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsDense(spark, dir)
      .select(col("source"), col("lang"), col("text"),
        regexp_count(col("text"), lit(PieceRegex)).as("n_pieces"),
        col("n_chars"))
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        (count(lit(1)) - countDistinct(col("text"))).as("n_dup_docs"),
        sum(col("n_pieces")).as("total_tokens"),
        round(expr("percentile(n_chars, 0.5)"), 4).as("p50_chars"),
        round(avg(col("n_chars")), 4).as("avg_chars"))
      .orderBy(col("source").asc, col("lang").asc)

  val corpusDatacardOracleSql: String =
    """WITH t AS (
      |  SELECT source, lang, text,
      |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
      |      AS n_pieces,
      |    n_chars
      |  FROM documents
      |)
      |SELECT source, lang, count(*) AS n_docs,
      |  count(*) - count(DISTINCT text) AS n_dup_docs,
      |  CAST(sum(n_pieces) AS BIGINT) AS total_tokens,
      |  round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
      |  round(avg(n_chars), 4) AS avg_chars
      |FROM t GROUP BY source, lang
      |ORDER BY source ASC, lang ASC""".stripMargin

  /** k-anonymity audit over quasi-identifiers — the re-identification
    * governance check a dataset release runs (Sweeney 2002): every
    * (lang, source, length-bucket) cell whose document count is below
    * `k` is a group an adversary could single out. Output = the risky
    * cells plus their exposure; an empty frame means the release is
    * k-anonymous under these quasi-identifiers.
    *
    * One hash-groupBy on the quasi-identifier tuple (map-side
    * combinable, cell count bounded by langs × sources × buckets) and
    * a HAVING — scan-shaped at any corpus size. */
  def kAnonymityRisk(spark: SparkSession, dir: String, k: Long,
      bucketChars: Long): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"),
        (col("n_chars") / lit(bucketChars)).cast("long").as("len_bucket"))
      .groupBy("lang", "source", "len_bucket")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") < k)
      .orderBy(col("lang").asc, col("source").asc, col("len_bucket").asc)

  /** Grouped length quantiles per language — the distribution block a
    * datacard draws as per-group box plots (p25/p50/p75/p95 of doc
    * length). Exact continuous-interpolation percentiles (Spark
    * `percentile` ≡ DuckDB `quantile_cont` — the pairing
    * [[corpusDatacard]] and sketch_quantiles already pin); group state
    * is bounded by the largest language, which the exact quantile
    * needs anyway. */
  def lengthQuantilesByLang(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(expr("percentile(n_chars, 0.25)"), 4).as("p25"),
        round(expr("percentile(n_chars, 0.5)"), 4).as("p50"),
        round(expr("percentile(n_chars, 0.75)"), 4).as("p75"),
        round(expr("percentile(n_chars, 0.95)"), 4).as("p95"))
      .orderBy(col("lang").asc)

  val lengthQuantilesByLangOracleSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  round(quantile_cont(n_chars, 0.25), 4) AS p25,
      |  round(quantile_cont(n_chars, 0.5), 4) AS p50,
      |  round(quantile_cont(n_chars, 0.75), 4) AS p75,
      |  round(quantile_cont(n_chars, 0.95), 4) AS p95
      |FROM documents GROUP BY lang ORDER BY lang ASC""".stripMargin

  def kAnonymityRiskOracleSql(k: Long, bucketChars: Long): String =
    s"""SELECT lang, source,
       |  CAST(floor(n_chars / $bucketChars.0) AS BIGINT) AS len_bucket,
       |  count(*) AS n_docs
       |FROM documents
       |GROUP BY 1, 2, 3
       |HAVING count(*) < $k
       |ORDER BY lang ASC, source ASC, len_bucket ASC""".stripMargin
}
