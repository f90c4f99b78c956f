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

  /** Z-order (Morton) key: interleave the low `bits` bits of two
    * non-negative dimensions — x in even positions, y in odd. Rows
    * sorted by this key cluster 2-D-close rows into the same parquet
    * row groups/files, so a conjunctive range filter on (x, y) prunes
    * by BOTH dimensions from one linear sort order (the layout trick
    * behind Delta/Iceberg Z-ORDER table maintenance). Pure long bit
    * arithmetic — exact, engine-independent, oracle-mirrored by
    * `zorderKeySql`. */
  def zorderKey(x: Column, y: Column, bits: Int): Column = {
    val mx = x.bitwiseAND(lit((1L << bits) - 1))
    val my = y.bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftleft(shiftright(mx, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(my, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The identical interleave as SQL text over expressions `x`/`y`
    * (pass short identifiers). */
  def zorderKeySql(x: String, y: String, bits: Int): String = {
    val mask = (1L << bits) - 1
    (0 until bits).map { i =>
      s"((((($x) & $mask) >> $i) & 1) << ${2 * i}) | " +
        s"((((($y) & $mask) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
  }

  /** Rewrite a frame into a Z-ordered layout: range-partition on the
    * key (so FILES own disjoint key ranges) and sort within partitions
    * (so ROW GROUPS inside each file are tight too). A later scan with
    * a 2-D range predicate prunes files via the partition ranges and
    * row groups via parquet min/max stats. */
  def writeZOrdered(df: DataFrame, dir: String, zcol: String,
      files: Int): Unit =
    df.repartitionByRange(files, col(zcol))
      .sortWithinPartitions(zcol)
      .write.mode("overwrite").parquet(dir)

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

  /** Registered z-order demo: the Morton key over (user_id, 10-minute
    * bucket) of the events table — the two columns an ops dashboard
    * filters together — with the first `k` rows in key order. The KEY
    * is the oracle-gated part; the layout effect (disjoint per-file
    * ranges after `writeZOrdered`) is plan-asserted in ScaleOpsSpec.
    *
    * The time bucket is REBASED to the corpus minimum before the
    * 16-bit mask: raw epoch buckets (~2.9M for 2026 data) alias every
    * 65536 buckets (~45 days), which would silently destroy the 2-D
    * clustering for any corpus spanning multiple alias periods. After
    * the rebase 16 bits covers ~455 days of data span. The min is a
    * one-number broadcast, not a driver action — the plan stays fully
    * distributed. */
  def zorderEventKeys(spark: SparkSession, dir: String,
      k: Int): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
    val secs = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
      case _ => unix_timestamp(col("ts"))
    }
    val keyed = ev.select(col("event_id"), col("user_id"),
        secs.cast("long").as("secs"))
      .withColumn("tbucket", expr("secs div 600"))
    val tmin = keyed.agg(min(col("tbucket")).as("tmin"))
    keyed.crossJoin(broadcast(tmin))
      .select(col("event_id"), col("user_id"), col("tbucket"),
        zorderKey(col("user_id"), col("tbucket") - col("tmin"), 16)
          .as("zkey"))
      .orderBy(col("zkey").asc, col("event_id").asc)
      .limit(k)
  }

  def zorderEventKeysOracleSql(k: Int): String =
    s"""WITH b AS (
       |  SELECT event_id, user_id,
       |    (epoch_ns(ts) // 1000000000) // 600 AS tbucket
       |  FROM events
       |), m AS (
       |  SELECT min(tbucket) AS tmin FROM b
       |)
       |SELECT event_id, user_id, tbucket,
       |  ${zorderKeySql("user_id", "tbucket - tmin", 16)} AS zkey
       |FROM b, m ORDER BY zkey ASC, event_id ASC LIMIT $k""".stripMargin

  /** Registered salted-aggregation demo: per-supplier count + quantity
    * total through the two-stage salted path. Salting is exact for
    * decomposable aggregates, so the plain GROUP BY is the oracle —
    * this hash-gates that the skew mechanism changes the SHAPE of the
    * shuffle, never the numbers. (l_quantity is integer-valued, so the
    * double sum is order-independent-exact.) */
  def saltedSuppAgg(spark: SparkSession, dir: String): DataFrame =
    saltedCountSum(graft.Tables.lineitem(spark, dir),
      "l_suppkey", "l_quantity", 8)
      .orderBy(col("l_suppkey").asc)

  val saltedSuppAggOracleSql: String =
    """SELECT l_suppkey, count(*) AS n, sum(l_quantity) AS total
      |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey ASC""".stripMargin

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
