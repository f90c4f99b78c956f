package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-scale physical-layout utilities: bucketed co-located joins and
  * skew salting. These are the concrete mechanisms behind the README's
  * 100 TB claims — demonstrated and plan-asserted in ScaleOpsSpec.
  */
object ScaleOps {

  /** Stable 8-hex-char key for a corpus directory — the shared naming
    * scheme for every per-corpus derived artifact (index tables,
    * fixtures). One definition so they can never drift apart. */
  def dirHash(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** Write both sides of a fact-fact join bucketed+sorted by the join
    * key into the session catalog. A subsequent join of the two tables
    * on that key is a SortMergeJoin with NO shuffle exchange on either
    * side (bucketing pre-partitions the data on disk) — at warehouse
    * scale this is how orders⋈lineitem avoids moving 100 TB.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // remove an orphaned managed location from a previous session, which
    // would otherwise fail CREATE TABLE with LOCATION_ALREADY_EXISTS
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = java.nio.file.Paths.get(warehouse, table.toLowerCase)
    graft.sources.ParquetStore.deleteRecursively(loc)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** The co-located join over two pre-bucketed tables. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** Salted high-cardinality aggregation for skewed keys: spread each
    * key over `salts` sub-keys in a first partial aggregate, then
    * combine. Turns one hot reducer into `salts` balanced ones. The
    * composition is exact for decomposable aggregates (count/sum here).
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id()
        + crc32(col(key).cast("string")), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("total"))

  /** Write a table partitioned by a column (the documents-by-collection
    * layout, SURVEY §4.3): queries filtering on that column prune whole
    * directories at planning time instead of scanning and filtering.
    */
  def writePartitioned(df: DataFrame, dir: String, col: String): Unit =
    df.write.mode("overwrite").partitionBy(col).parquet(dir)

  /** Number of files the scan will actually read (post partition
    * pruning) for the given filtered frame. */
  def filesRead(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    nodes(df.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec => s.selectedPartitions.totalNumberOfFiles
    }.sum
  }

  /** Detects whether a physical plan contains a shuffle exchange.
    * Walks THROUGH AQE wrapper nodes (AdaptiveSparkPlanExec /
    * QueryStageExec hide their subtrees from a plain collect). */
  def hasShuffleExchange(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.count() // materialize so AQE finalizes the plan
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    nodes(df.queryExecution.executedPlan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
  }
}
