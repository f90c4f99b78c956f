package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalyzer

/** Sketch operators (the brief's "novel sketch" slot).
  *
  * Count-min sketch over the corpus term stream: d md5-derived hash
  * rows × w buckets; each token occurrence increments one bucket per
  * row; a term's frequency estimate is the MINIMUM of its d bucket
  * counts — never an underestimate, overestimates bounded by collision
  * mass (Cormode & Muthukrishnan 2005). All hashing is md5-hex-prefix
  * based so the DuckDB oracle computes the identical sketch, and the
  * build is one groupBy over (row, bucket): d·w cells total regardless
  * of corpus size — the sketch is mergeable across partitions/batches
  * by cell-wise addition, which is exactly what the partial aggregate
  * does.
  */
object Sketches {

  val Depth = 4
  val Width = 256 // one md5 hex-pair → bucket in [0, 255]

  /** bucket_i(token) = first hex byte of md5(i || ':' || token). */
  private def bucketExpr(i: Int, token: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit(s"$i:"), token)), 1, 2), 16, 10)
      .cast("int")

  /** The sketch cells: (row, bucket, cnt) — d·w rows max. One corpus
    * scan: each token explodes to its Depth (sketch_row, bucket) structs
    * instead of unioning Depth re-tokenized scans. */
  def countMinCells(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(TextAnalyzer.tokens(col("text"))).as("token"))
    toks
      .select(explode(array((0 until Depth).map(i =>
        struct(lit(i).as("sketch_row"),
          bucketExpr(i, col("token")).as("bucket"))): _*)).as("cell"))
      .groupBy(col("cell.sketch_row").as("sketch_row"),
        col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Estimates vs. truth for a set of probe terms: the count-min
    * guarantee (estimate >= true count) is directly visible in the
    * output. */
  def countMinEstimates(spark: SparkSession, dir: String,
      terms: Seq[String]): DataFrame = {
    import spark.implicits._
    val cells = countMinCells(spark, dir)
    val probes = terms
      .flatMap { t =>
        (0 until Depth).map(i => (t, i,
          Integer.parseInt(
            md5Hex(s"$i:$t").substring(0, 2), 16)))
      }
      .toDF("term", "sketch_row", "bucket")
    val trueTf = Tables.documents(spark, dir)
      .select(explode(TextAnalyzer.tokens(col("text"))).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col("token").as("term"))
      .agg(count(lit(1)).as("true_tf"))
    probes
      .join(cells, Seq("sketch_row", "bucket"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_estimate"))
      .join(trueTf, Seq("term"), "left")
      .select(col("term"), coalesce(col("true_tf"), lit(0L)).as("true_tf"),
        col("cm_estimate"))
      .orderBy(col("term").asc)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def countMinOracleSql(terms: Seq[String]): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val rowsUnion = (0 until Depth).map { i =>
      s"""SELECT $i AS sketch_row,
         |  CAST('0x' || substr(md5('$i:' || token), 1, 2) AS INT)
         |    AS bucket
         |FROM toks""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    val probeRows = terms.flatMap { t =>
      (0 until Depth).map(i =>
        s"('$t', $i, CAST('0x' || substr(md5('$i:' || '$t'), 1, 2) AS INT))")
    }.mkString(", ")
    s"""WITH toks AS (
       |  SELECT t AS token FROM (
       |    SELECT ${TextAnalyzer.sqlTokenize("text")} AS t FROM documents
       |  ) WHERE ${TextAnalyzer.sqlTermFilter("t")}
       |), cells AS (
       |  SELECT sketch_row, bucket, count(*) AS cnt FROM (
       |  $rowsUnion
       |  ) GROUP BY sketch_row, bucket
       |), probes(term, sketch_row, bucket) AS (VALUES $probeRows),
       |est AS (
       |  SELECT p.term, min(coalesce(c.cnt, 0)) AS cm_estimate
       |  FROM probes p LEFT JOIN cells c
       |    ON c.sketch_row = p.sketch_row AND c.bucket = p.bucket
       |  GROUP BY p.term
       |), truth AS (
       |  SELECT token AS term, count(*) AS true_tf FROM toks
       |  WHERE token IN ($termList) GROUP BY token
       |)
       |SELECT e.term, coalesce(t.true_tf, 0) AS true_tf, e.cm_estimate
       |FROM est e LEFT JOIN truth t ON t.term = e.term
       |ORDER BY e.term ASC""".stripMargin
  }

  /** Exact interpolated quantiles of event values per type (Spark
    * `percentile` ≡ DuckDB `quantile_cont` — both the continuous
    * interpolated definition, so the oracle is exact). */
  def eventQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy(col("event_type").asc)

  val eventQuantilesOracleSql: String =
    """SELECT event_type, count(*) AS n,
      |  round(quantile_cont(value, 0.5), 6) AS p50,
      |  round(quantile_cont(value, 0.95), 6) AS p95,
      |  round(quantile_cont(value, 0.99), 6) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type ASC""".stripMargin
}
