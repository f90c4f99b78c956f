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

  /** Content fingerprint of one fixture table under `dir`: a digest
    * over the path plus every data file's (name, size, mtime). Derived
    * tables memoized by catalog name MUST key on this rather than
    * [[dirHash]] alone when their consumers outlive a fixture
    * regeneration — ScaleUp overwrites the same out dir, and a
    * dir-only key would keep serving the STALE corpus from the session
    * catalog (r13 ADVICE, ensurePartitionedDocuments). Handles both
    * fixture layouts: single file `<t>.parquet` and Spark-written
    * directories. */
  def contentHash(dir: String, table: String): String = {
    import java.nio.file.{Files, Path, Paths}
    import scala.jdk.CollectionConverters._
    val p = Paths.get(dir, s"$table.parquet")
    val files: Seq[Path] =
      if (Files.isDirectory(p)) {
        // close the listing stream deterministically: this runs once per
        // index-name lookup per query, and a leaked directory fd per call
        // exhausts the fd table over a long bench sweep
        val listing = Files.list(p)
        try
          listing.iterator().asScala.toSeq
            .filter(f => f.getFileName.toString.endsWith(".parquet"))
            .sortBy(_.getFileName.toString)
        finally listing.close()
      } else if (Files.exists(p)) Seq(p)
      else Seq.empty
    val sig = files.map(f =>
      s"${f.getFileName}:${Files.size(f)}:" +
        s"${Files.getLastModifiedTime(f).toMillis}").mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir|$sig".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
  }

  /** Driver-side size in bytes of one fixture table under `dir` —
    * metadata only (no Spark job), the cheap corpus-size signal
    * routing policies key on (Fts.routeToIndex). Handles both fixture
    * layouts like [[contentHash]]. */
  def tableBytes(dir: String, table: String): Long = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val p = Paths.get(dir, s"$table.parquet")
    if (Files.isDirectory(p)) {
      val listing = Files.list(p)
      try
        listing.iterator().asScala
          .filter(f => f.getFileName.toString.endsWith(".parquet"))
          .map(Files.size(_)).sum
      finally listing.close()
    } else if (Files.exists(p)) Files.size(p)
    else 0L
  }

  /** Driver-side on-disk bytes of a persisted warehouse table —
    * metadata only (no Spark job), the [[tableBytes]] analog for
    * catalog tables: the cheap size signal routing policies key on
    * (nbConfusion's broadcast-vs-shuffle model join). 0 if absent. */
  def warehouseTableBytes(spark: SparkSession, table: String): Long = {
    import scala.jdk.CollectionConverters._
    val loc = tableLocation(spark, table)
    if (!java.nio.file.Files.isDirectory(loc)) 0L
    else {
      val s = java.nio.file.Files.walk(loc)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map(java.nio.file.Files.size(_)).sum
      finally s.close()
    }
  }

  // --- Build-once / ATTACH-many persisted tables ------------------------

  /** Driver-side accounting of persisted-table build time (r19 verdict
    * #1): every ensure-build that actually constructs a generation —
    * the bucketed writer plus the few manual saveAsTable builders —
    * accumulates its wall time here, and `graft.Bench` reports the
    * warm-up pre-pass's total as `ensure_build_sec` on the contract
    * line. First-touch build cost is thereby visible as its own number
    * instead of an unattributable slowdown in whichever session builds
    * a generation first; a cold-warehouse and a warm-warehouse bench
    * differ by exactly this figure (plus page-cache noise), so their
    * per-query mins become comparable. Reentrant: a builder whose
    * build body ensures another table counts once, under the OUTERMOST
    * build (per-thread depth guard). */
  object BuildTimer {
    private val nanos = new java.util.concurrent.atomic.AtomicLong(0L)
    private val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    private val depth = new ThreadLocal[Integer] {
      override def initialValue: Integer = 0
    }
    def timed[T](body: => T): T = {
      val d: Int = depth.get
      depth.set(d + 1)
      val t0 = System.nanoTime()
      try body
      finally {
        depth.set(d)
        if (d == 0) {
          nanos.addAndGet(System.nanoTime() - t0)
          builds.incrementAndGet()
        }
      }
    }
    def totalSec: Double = nanos.get / 1e9
    def count: Int = builds.get
  }

  /** Layout-version stamp baked into every attachable table's marker.
    * BUMP THIS whenever ANY persisted-table builder changes its output
    * schema, content, or bucketing — a stale on-disk generation from
    * older builder code then fails the marker check and is rebuilt
    * (today's per-JVM behavior) instead of being silently attached.
    * Within one code version, a fresh JVM ATTACHES the existing files
    * instead of rebuilding — which is both the serving-fleet design at
    * 100 TB (indexes are built once and attached by every session) and
    * the fix for the cross-JVM clobber race (a fresh JVM's in-memory
    * catalog sees tableExists=false and would otherwise DROP+rewrite
    * files a concurrent session is mid-scan on — the r18 ladder crash). */
  private val AttachLayoutVersion = "r18a"
  private val AttachMarker = "_GRAFT_ATTACH"

  private def tableLocation(spark: SparkSession,
      table: String): java.nio.file.Path = {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    java.nio.file.Paths.get(warehouse, table.toLowerCase)
  }

  /** Marker write — called by [[writeBucketed]] (and the few manual
    * saveAsTable builders) AFTER a successful commit, so the marker's
    * presence certifies a complete build: any interrupted build or
    * partially-deleted location has no marker (it is deleted FIRST on
    * rebuild) and attach falls through to a clean rebuild. */
  def markAttachable(spark: SparkSession, table: String): Unit = {
    import java.nio.file.{Files, StandardOpenOption => O}
    val loc = tableLocation(spark, table)
    if (java.nio.file.Files.isDirectory(loc))
      Files.write(loc.resolve(AttachMarker),
        AttachLayoutVersion.getBytes("UTF-8"),
        O.CREATE, O.TRUNCATE_EXISTING)
  }

  /** Marker delete — called BEFORE any drop/delete/rewrite of the
    * location, so no concurrent or later session can attach a dying
    * generation. */
  def unmarkAttachable(spark: SparkSession, table: String): Unit =
    try java.nio.file.Files.deleteIfExists(
      tableLocation(spark, table).resolve(AttachMarker))
    catch { case _: java.io.IOException => () }

  /** One table of an attach group: `bucket` = (key, nBuckets) for
    * bucketed layouts, `partitionCols` for directory-partitioned ones,
    * neither for plain parquet tables. */
  case class AttachSpec(table: String,
      bucket: Option[(String, Int)] = None,
      partitionCols: Seq[String] = Nil)

  /** Attach a group of previously-persisted warehouse tables into this
    * session's catalog as external tables — all-or-nothing: true iff
    * EVERY member has a complete (_SUCCESS + current-layout marker)
    * directory and every registration succeeded. On false the caller
    * builds from scratch exactly as before (writeBucketed starts with
    * DROP TABLE IF EXISTS, so a partially-registered group is repaired
    * by the build path). Registration is metadata-only — one parquet
    * footer read per table for the schema, zero Spark jobs over the
    * data — and the registered bucket/partition spec reproduces the
    * built layout bit-for-bit (bucket ids live in the file names), so
    * bucket pruning and co-located joins behave identically to the
    * building session (AttachSpec path pinned in ScaleOpsSpec). */
  def attachAll(spark: SparkSession, specs: Seq[AttachSpec]): Boolean = {
    import java.nio.file.Files
    val complete = specs.forall { s =>
      val loc = tableLocation(spark, s.table)
      Files.exists(loc.resolve("_SUCCESS")) &&
        (try new String(Files.readAllBytes(loc.resolve(AttachMarker)),
          "UTF-8") == AttachLayoutVersion
        catch { case _: java.io.IOException => false })
    }
    complete && (try {
      specs.foreach { s =>
        if (!spark.catalog.tableExists(s.table)) {
          val loc = tableLocation(spark, s.table)
          val schema = spark.read.parquet(loc.toString).schema
          val bucketDdl = s.bucket.map { case (k, n) =>
            s"CLUSTERED BY (`$k`) SORTED BY (`$k`) INTO $n BUCKETS"
          }.getOrElse("")
          val partDdl =
            if (s.partitionCols.isEmpty) ""
            else s.partitionCols.mkString(
              "PARTITIONED BY (`", "`, `", "`)")
          spark.sql(
            s"""CREATE TABLE `${s.table}` (${schema.toDDL})
               |USING PARQUET $partDdl $bucketDdl
               |LOCATION '${loc.toUri}'""".stripMargin)
          if (s.partitionCols.nonEmpty)
            spark.sql(s"ALTER TABLE `${s.table}` RECOVER PARTITIONS")
        }
      }
      true
    } catch { case scala.util.control.NonFatal(_) => false })
  }

  /** Bucketed-group sugar for the common ensure-site shape:
    * `attach(spark, name -> ("term", 32), s"${name}_dl" -> ("doc_id", 8))`. */
  def attach(spark: SparkSession,
      specs: (String, (String, Int))*): Boolean =
    attachAll(spark, specs.map { case (t, (k, n)) =>
      AttachSpec(t, Some((k, n))) })

  // --- Single-builder lock ----------------------------------------------

  /** How long a waiter honors another session's build lock before
    * treating the builder as hung and taking over. Generous: the
    * largest single-table build two decades above the fixture (the
    * sf10 inverted index) commits in low minutes. */
  private val StaleLockMs = 15 * 60 * 1000L
  private val LockPollMs = 500L

  private def lockPath(spark: SparkSession,
      table: String): java.nio.file.Path =
    tableLocation(spark, table).getParent
      .resolve(s".graft_build_${table.toLowerCase}.lock")

  /** One atomic create attempt; breaks a lock whose recorded builder
    * PID is no longer alive (single-host local[*] regime — ProcessHandle
    * answers for any PID on this machine). */
  private def tryAcquireBuildLock(spark: SparkSession,
      table: String): Boolean = {
    import java.nio.file.{Files, StandardOpenOption => O}
    val lock = lockPath(spark, table)
    try {
      Files.createDirectories(lock.getParent)
      Files.write(lock,
        ProcessHandle.current.pid.toString.getBytes("UTF-8"),
        O.CREATE_NEW, O.WRITE)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val dead = try {
          val pid = new String(Files.readAllBytes(lock), "UTF-8").trim
          val h = ProcessHandle.of(pid.toLong)
          !(h.isPresent && h.get.isAlive)
        } catch { case scala.util.control.NonFatal(_) => false }
        val stale = try {
          System.currentTimeMillis -
            Files.getLastModifiedTime(lock).toMillis > StaleLockMs
        } catch { case _: java.io.IOException => true }
        if (dead || stale) {
          try Files.deleteIfExists(lock)
          catch { case _: java.io.IOException => () }
        }
        false
      case _: java.io.IOException => true // unlockable fs: build anyway
    }
  }

  private def releaseBuildLock(spark: SparkSession, table: String): Unit =
    try java.nio.file.Files.deleteIfExists(lockPath(spark, table))
    catch { case _: java.io.IOException => () }

  /** Block while ANOTHER live builder holds the lock. Returns when the
    * lock is gone (builder committed or died — tryAcquire breaks dead
    * and stale locks). */
  private def awaitBuildLock(spark: SparkSession, table: String): Unit = {
    val deadline = System.currentTimeMillis + StaleLockMs + 60000L
    while (java.nio.file.Files.exists(lockPath(spark, table))
        && System.currentTimeMillis < deadline)
      Thread.sleep(LockPollMs)
  }

  /** Write both sides of a fact-fact join bucketed+sorted by the join
    * key into the session catalog. A subsequent join of the two tables
    * on that key is a SortMergeJoin with NO shuffle exchange on either
    * side (bucketing pre-partitions the data on disk) — at warehouse
    * scale this is how orders⋈lineitem avoids moving 100 TB.
    *
    * Single-builder discipline (r18): the write runs under a PID-
    * bearing lock file beside the table location. A concurrent session
    * racing for the SAME absent generation waits for the winner's
    * committed marker and ATTACHES it instead of clobbering the files
    * mid-write (the last unclosed race after the ensure-guards learned
    * to attach); a lock whose builder PID is dead — or older than
    * [[StaleLockMs]] — is broken and the build taken over, so a
    * crashed builder never wedges the fleet. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    var attempts = 0
    while (attempts < 100) {
      attempts += 1
      if (tryAcquireBuildLock(spark, table)) {
        try {
          BuildTimer.timed(doWriteBucketed(df, table, key, buckets))
        } finally releaseBuildLock(spark, table)
        return
      }
      awaitBuildLock(spark, table)
      // the other builder committed: serve its generation (identical
      // by construction — generation names are content-fingerprinted)
      if (attach(spark, table -> (key, buckets))
          || spark.catalog.tableExists(table)) return
      // died without committing: loop and take over
    }
    // pathological: build unlocked
    BuildTimer.timed(doWriteBucketed(df, table, key, buckets))
  }

  private def doWriteBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    // the marker dies FIRST: from here to the post-commit markAttachable
    // the location is never attachable, so an interrupted rebuild can
    // only ever be rebuilt, never served
    unmarkAttachable(spark, table)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // remove an orphaned managed location from a previous session, which
    // would otherwise fail CREATE TABLE with LOCATION_ALREADY_EXISTS
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = java.nio.file.Paths.get(warehouse, table.toLowerCase)
    graft.sources.ParquetStore.deleteRecursively(loc)
    // repartition on the bucket key FIRST: without it every input task
    // writes its own file per bucket (N_tasks × buckets small files —
    // a 20k-row band table measured 4071 files and 1.4 s per bare
    // scan), with it each bucket is exactly one file and probe-side
    // scans open `buckets` footers. One extra exchange on the
    // build-once path buys every probe's scan cost down.
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
    markAttachable(spark, table)
  }

  /** The co-located join over two pre-bucketed tables. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** Build-once: orders and lineitem bucketed+sorted on the order key
    * (lineitem's key renamed so the join key is ONE column name on both
    * sides). Idempotent per (dir). */
  def ensureBucketedFacts(spark: SparkSession,
      dir: String): (String, String) = {
    val bo = s"graft_bord_${contentHash(dir, "orders")}"
    val bl = s"graft_blin_${contentHash(dir, "lineitem")}"
    if (!spark.catalog.tableExists(bo)
        && !attach(spark, bo -> ("o_orderkey", 16)))
      writeBucketed(graft.Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate"), bo,
        "o_orderkey", 16)
    if (!spark.catalog.tableExists(bl)
        && !attach(spark, bl -> ("o_orderkey", 16)))
      writeBucketed(graft.Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_extendedprice"), col("l_discount")), bl,
        "o_orderkey", 16)
    (bo, bl)
  }

  /** The fully exchange-free fact-fact query: top-k orders by revenue
    * over the PRE-BUCKETED orders⋈lineitem. Both scans are
    * hash-distributed on o_orderkey on disk, so the SortMergeJoin needs
    * no exchange on either side AND the per-order aggregate reuses the
    * same distribution — the whole plan's only data movement is the
    * final TakeOrdered(k). At 100 TB this layout is the difference
    * between shuffling the two largest tables per query and shuffling
    * NOTHING (ScaleOpsSpec asserts zero ShuffleExchange in this exact
    * plan). Decimal-summed revenue keeps the hash stable across
    * partition orderings. */
  def bucketedRevenue(spark: SparkSession, dir: String,
      k: Int): DataFrame = {
    val (bo, bl) = ensureBucketedFacts(spark, dir)
    spark.table(bo).join(spark.table(bl), Seq("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(round(sum((col("l_extendedprice")
          * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)")), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(k)
  }

  def bucketedRevenueOracleSql(k: Int): String =
    s"""SELECT o_orderkey, o_orderdate,
       |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
       |    AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
       |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |GROUP BY 1, 2
       |ORDER BY revenue DESC, o_orderkey ASC LIMIT $k""".stripMargin

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

  /** Exact per-key COUNT DISTINCT with a salted combine — the member
    * of the skew family where salting genuinely pays. (For plain
    * count/sum, hash partial aggregation already collapses each map
    * task's hot-key rows to one row, so the hot reducer never sees the
    * skew; [[saltedCountSum]] documents that pattern. COUNT DISTINCT
    * defeats partial reduction: the final per-key aggregate receives
    * ONE ROW PER DISTINCT VALUE of the hot key — a zipf head key with
    * 10⁶ distinct values funnels 10⁶ rows into a single reducer.)
    * Three exchanges, all balanced: (1) distinct on (key, value) —
    * spread by the value component; (2) count per (key,
    * hash(value) mod salts) — the hot key fans over `salts` reducers;
    * (3) sum the salt-counts per key — `salts` rows per key, trivial.
    * Exact because the salt partitions each key's distinct-value SET.
    * graft.SkewStress measures the win on a zipf corpus; BENCHNOTES
    * carries the rung. */
  def saltedDistinctCount(df: DataFrame, key: String, value: String,
      salts: Int): DataFrame =
    df.select(col(key), col(value)).distinct()
      .groupBy(col(key),
        pmod(xxhash64(col(value)), lit(salts.toLong)).as("_salt"))
      .agg(count(lit(1)).as("_n"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n_distinct"))

  /** Registered form: distinct users per event type — event_type is a
    * NATURALLY skewed key (a handful of values over the whole fact
    * table), so the unsalted plan's final agg would receive every
    * distinct (type, user) pair of the hottest type in one task. */
  def saltedDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    saltedDistinctCount(
      graft.Tables.events(spark, dir), "event_type", "user_id", 32)
      .select(col("event_type"), col("n_distinct"))
      .orderBy(col("event_type").asc)

  val saltedDistinctUsersOracleSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_distinct
      |FROM events GROUP BY event_type ORDER BY event_type ASC""".stripMargin

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
    * bounded one-row collect baked in as a LITERAL (the same pattern as
    * the IVF probe cells, Similarity.ivfTopK): paying one tiny
    * min-aggregation job up front keeps the main pass a single
    * scan-local job — the r7 crossJoin(broadcast) form re-planned an
    * extra aggregation + exchange per query for the same one number. */
  def zorderEventKeys(spark: SparkSession, dir: String,
      k: Int): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
    val keyed = ev.select(col("event_id"), col("user_id"),
        graft.Tables.tsSeconds(ev).cast("long").as("secs"))
      .withColumn("tbucket", expr("secs div 600"))
    val tmin = keyed.agg(min(col("tbucket"))).collect()(0).getLong(0)
    keyed
      .select(col("event_id"), col("user_id"), col("tbucket"),
        zorderKey(col("user_id"), col("tbucket") - lit(tmin), 16)
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

  // --- Bloom semi-join reduction (runtime-filter pattern) ---------------

  /** 4096-bit / 5-hash bloom over a join key — the explicit form of the
    * engine runtime filter (Spark's spark.sql.optimizer.runtime.
    * bloomFilter, the sideways information passing of warehouse
    * engines): the DIM side's keys compress to a fixed 512-byte bit
    * array that rides into the FACT scan as a literal, discarding
    * non-matching rows before they reach the join's shuffle. No false
    * negatives, so the join result is EXACTLY the plain join — which is
    * what lets the plain join be the oracle. */
  val JoinBloomBits = 4096
  val JoinBloomHashes = 5

  /** index_k(key) = xxhash64(k, CAST(key AS BIGINT)) mod 4096.
    * xxhash64 stays inside whole-stage codegen as a few integer ops
    * per row — the earlier md5-hex form (hash → hex string →
    * substring → base-16 conv) paid string materialization 5× per
    * fact row and dominated the probe scan.
    *
    * The BIGINT canonicalization makes the false-negative-freedom
    * STRUCTURAL rather than a same-type calling convention: xxhash64
    * output depends on the input Spark type, so an INT build key
    * probed with a BIGINT fact key would otherwise silently hash to
    * different cells and DROP matching join rows. CAST AS BIGINT maps
    * every integral width (and numeric strings) of the same value to
    * the same long; values outside the long domain cast to NULL on
    * BOTH sides, and xxhash64 folds NULL to its seed hash — so such
    * keys collapse to one shared cell, degrading the filter to
    * always-pass (a false POSITIVE, which the plain-join semantics
    * absorb) but never to a false negative. Any hash family is
    * admissible here: the bloom can only produce false positives, and
    * the oracle is the plain join. */
  private def jbloomIdx(k: Int, key: Column): Column =
    pmod(xxhash64(lit(k), key.cast("long")), lit(JoinBloomBits))
      .cast("int")

  /** Distributed bloom build: each dim key explodes to its 5 bit
    * indexes, ONE partial-agg shuffle folds them to ≤64 (word, bits)
    * cells, and only those 64 longs reach the driver — the build cost
    * is dim-scan + a fixed-size collect no matter how large the dim. */
  def buildJoinBloom(keys: DataFrame, keyCol: String): Array[Long] = {
    val cells = keys
      .select(explode(array((0 until JoinBloomHashes).map(k =>
        jbloomIdx(k, col(keyCol))): _*)).as("idx"))
      .groupBy((col("idx") / 64).cast("int").as("word"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), idx % 64)"))
        .as("bits"))
      .collect()
    val words = Array.fill(JoinBloomBits / 64)(0L)
    cells.foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Scan-local might-contain predicate against the literal word array:
    * 5 integer hashes + 5 bit tests per row, zero joins, zero
    * shuffles. Build and probe keys may differ in integral width
    * (INT dim key vs BIGINT fact key is the common star-schema case):
    * [[jbloomIdx]] canonicalizes both sides to BIGINT before hashing,
    * so type mismatches cannot introduce false negatives. */
  def joinBloomMightContain(words: Seq[Long], key: Column): Column = {
    val wl = typedLit(words)
    (0 until JoinBloomHashes).map { k =>
      val idx = jbloomIdx(k, key)
      val word = element_at(wl, (idx / 64).cast("int") + 1)
      call_function("shiftright", word, pmod(idx, lit(64)))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Driver memo for built join blooms: the 64-long word array is a
    * pure function of (dim-table generation, build frame, key column),
    * so a steady-state serving process builds each bloom ONCE per
    * corpus generation instead of paying the dim-scan + collect job
    * per query (r18; the prefixBounds treatment). Values are 512 bytes
    * each, LRU-bounded, generation-checked on lookup.
    *
    * r19 (ADVICE): the key derives from the ANALYZED PLAN's semantic
    * hash rather than a hand-maintained tag string — a caller that
    * changes the build predicate (or passes a differently-filtered
    * keys frame) can no longer silently share a stale bloom, which for
    * a bloom means FALSE NEGATIVES (dropped join rows). Values are
    * stored immutable and cloned out, so no caller can poison the
    * cached words by mutating the returned array. */
  private val joinBloomMemo =
    new DriverMemo[(String, Int, String), Vector[Long]](64)

  def buildJoinBloomMemo(keys: DataFrame, gen: String,
      keyCol: String): Array[Long] =
    joinBloomMemo.getOrCompute(
      (gen, keys.queryExecution.analyzed.semanticHash(), keyCol), gen) {
      buildJoinBloom(keys, keyCol).toVector
    }.toArray

  /** Registered demo: order revenue by priority for BUILDING-segment
    * customers, with the orders scan pre-pruned by the customer-key
    * bloom. ~1/5 of customers are BUILDING, so ~80% of orders rows
    * (minus bloom false positives) never enter the join. The oracle is
    * the PLAIN join — hash-equality proves the bloom pruned without
    * changing a single row. Decimal summation keeps the aggregate off
    * double rounding boundaries. */
  def bloomPrunedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = graft.Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === lit("BUILDING"))
      .select("c_custkey")
    val words = buildJoinBloomMemo(cust,
      contentHash(dir, "customer"), "c_custkey")
    graft.Tables.orders(spark, dir)
      .filter(joinBloomMightContain(words.toSeq, col("o_custkey")))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,6)")), 2)
          .cast("double").as("total_price"))
      .orderBy(col("o_orderpriority").asc)
  }

  val bloomPrunedRevenueOracleSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)
      |    AS DOUBLE) AS total_price
      |FROM orders JOIN customer ON c_custkey = o_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority ASC""".stripMargin

  // --- Distributed prefix sum -------------------------------------------

  /** The two-pass distributed prefix sum — the cluster-scale form of a
    * global-order running total that a single-reducer window cannot
    * provide at 100 TB. Pass 0: one distributed quantile sketch over
    * the order key yields `partitions-1` range boundaries, collected
    * ONCE to the driver (bounded: a few doubles) and baked into the
    * plan as literals, so every row's bucket `_pid` is a pure
    * scan-local function of its key. This is deliberate: a
    * `repartitionByRange` here would plant a sampling RangePartitioner
    * in BOTH downstream branches (the row window and the offset
    * aggregate), and their bucket assignments would agree only while
    * exchange reuse happens to fire — literal boundaries make the two
    * branches agree by construction. Pass 1: each bucket owns a
    * disjoint, contiguous key range; the within-bucket running total
    * is a `partitionBy(_pid)` window (each reducer sees only its own
    * bucket). Pass 2: per-bucket sums (nPartitions rows) take their
    * own exclusive prefix — a window over a trivially small frame —
    * and broadcast back as each bucket's offset. No row-level data
    * ever converges on one reducer.
    *
    * Exact for integer values (long addition is associative), which is
    * what running token/row totals are. Quantile error only skews
    * bucket SIZES, never the result. Requires a numeric, non-null
    * order key. Emits the input columns plus `cum_before` = the
    * exclusive prefix sum of `valCol` in `orderCol` order (ties within
    * a duplicate order key are resolved by the row's bucket-local
    * position — pass a unique key). */
  /** Memoized bucket boundaries for [[prefixSummed]], keyed by a
    * generation-bearing identity (a persisted-table name or corpus
    * fingerprint): the boundaries are a deterministic function of the
    * corpus, so steady-state re-invocations of a prefix-sum query skip
    * the approxQuantile driver action entirely (r17 verdict #6 — the
    * probe was one of the 4-5 sequential job floors behind
    * pack_sequences / quality_ppl_buckets). Any boundary set is
    * CORRECT (it only skews bucket sizes), so memo staleness across an
    * in-place regeneration could not corrupt results even without the
    * generation check — but the check keeps the sizes honest.
    *
    * CALLER CONTRACT (r19 ADVICE): the key (gen, orderCol, partitions)
    * does not identify the source FRAME — two operators sharing those
    * three share boundaries even if their filters/projections differ.
    * Callers must never rely on the returned bounds being quantiles of
    * their specific frame; only the bucket-size skew is at stake,
    * which is what makes the coarser key safe. */
  private val boundsMemo =
    new DriverMemo[(String, String, Int), Array[Double]](64)

  def prefixBounds(df: DataFrame, gen: String, orderCol: String,
      partitions: Int): Array[Double] =
    boundsMemo.getOrCompute((gen, orderCol, partitions), gen) {
      val probs = (1 until partitions).map(_.toDouble / partitions).toArray
      if (probs.isEmpty) Array.empty[Double]
      else df.stat.approxQuantile(orderCol, probs, 0.01)
    }

  def prefixSummed(df: DataFrame, orderCol: String, valCol: String,
      partitions: Int, precomputedBounds: Option[Array[Double]] = None)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probs = (1 until partitions).map(_.toDouble / partitions).toArray
    val bounds = precomputedBounds.getOrElse {
      if (probs.isEmpty) Array.empty[Double]
      else df.stat.approxQuantile(orderCol, probs, 0.01)
    }
    // bucket i owns keys in (bounds(i-1), bounds(i)] — contiguous by
    // construction since every row compares against the same literals
    val pidExpr = bounds.distinct.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(orderCol) > lit(b), 1).otherwise(0)
    }
    val bucketed = df.withColumn("_pid", pidExpr)
    val local = Window.partitionBy("_pid")
      .orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = bucketed.withColumn("_local",
      coalesce(sum(col(valCol)).over(local), lit(0L)))
    // the offsets window runs over nPartitions rows (one per bucket) —
    // bounded by construction. Its partition key is constant-zero
    // (_pid is never negative) but written non-foldably: a bare lit(0)
    // would be constant-folded out of the windowspec and WindowExec
    // would log its misleading single-partition warning for a frame
    // that is small by design
    val offsets = bucketed.groupBy("_pid")
      .agg(sum(col(valCol)).as("_psum"))
      .withColumn("_offset",
        coalesce(sum(col("_psum")).over(
          Window.partitionBy(least(col("_pid"), lit(0)))
            .orderBy(col("_pid").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_offset")
    withLocal.join(broadcast(offsets), "_pid")
      .withColumn("cum_before", col("_local") + col("_offset"))
      .drop("_pid", "_local")
  }

  // --- Corpus integrity & diagnostics -----------------------------------

  /** Order-independent table digest — the dataset-versioning primitive
    * a training pipeline pins its runs to: per table, a 28-bit md5 row
    * hash folded with BOTH an additive and a xor aggregate (either
    * alone can be fooled; together they fingerprint multiset content).
    * Both folds are commutative, so the digest is independent of
    * partitioning, row order, and executor count — any two engines (or
    * the same corpus before/after a rewrite) agree iff the rows agree.
    * One scan + a 1-row aggregate per table; 28-bit hashes keep the
    * additive fold far from long overflow (needs > 2^35 rows to wrap).
    * Digest columns are the stable identity columns; mutable doubles
    * and timestamps are excluded (their string forms are
    * engine-formatting-sensitive). */
  def tableDigests(spark: SparkSession, dir: String): DataFrame = {
    def digest(df: DataFrame, name: String,
        cols: Seq[Column]): DataFrame = {
      // NULL-safe row string: concat_ws would silently SKIP null
      // columns (so a null-shift between adjacent columns hashes
      // identically, and the oracle's || would null the whole row) —
      // coalesce each column to a \u0001 sentinel instead
      val h = conv(substring(md5(concat_ws("|",
        cols.map(c => coalesce(c.cast("string"), lit("\u0001"))): _*)),
        1, 7), 16, 10).cast("long")
      df.select(h.as("h"))
        .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("hash_sum"),
          expr("bit_xor(h)").as("hash_xor"))
        .select(lit(name).as("table_name"), col("n_rows"),
          col("hash_sum"), col("hash_xor"))
    }
    val d = graft.Tables.documents(spark, dir)
    val e = graft.Tables.events(spark, dir)
    val o = graft.Tables.orders(spark, dir)
    digest(d, "documents",
      Seq(col("doc_id"), col("lang"), col("source"), col("text")))
      .unionAll(digest(e, "events",
        Seq(col("event_id"), col("user_id"), col("event_type"))))
      .unionAll(digest(o, "orders",
        Seq(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"))))
      .orderBy(col("table_name").asc)
  }

  val tableDigestsOracleSql: String = {
    def nn(expr: String): String = s"coalesce($expr, chr(1))"
    def one(table: String, cols: Seq[String]): String = {
      val rowExpr = cols.map(nn).mkString(" || '|' || ")
      s"""SELECT '$table' AS table_name, count(*) AS n_rows,
         |  CAST(sum(h) AS BIGINT) AS hash_sum,
         |  bit_xor(h) AS hash_xor
         |FROM (SELECT CAST('0x' || substr(md5($rowExpr), 1, 7)
         |  AS BIGINT) AS h FROM $table)""".stripMargin
    }
    Seq(
      one("documents", Seq("CAST(doc_id AS VARCHAR)", "lang", "source",
        "text")),
      one("events", Seq("CAST(event_id AS VARCHAR)",
        "CAST(user_id AS VARCHAR)", "event_type")),
      one("orders", Seq("CAST(o_orderkey AS VARCHAR)",
        "CAST(o_custkey AS VARCHAR)", "o_orderstatus", "o_orderpriority"))
    ).mkString("", "\nUNION ALL\n", "\nORDER BY table_name ASC")
  }

  /** ANALYZE-style column statistics over lineitem — the per-column
    * (count, NDV, min, max) block a cost-based optimizer (and every
    * data catalog) feeds on. ONE scan computes every column's moments
    * in a single aggregate row (count/min/max are plain combinable
    * aggregates; the multi-column exact countDistinct plans one Expand
    * — at 100 TB swap the exact NDVs for the HLL sketch this repo
    * already ships in `sketch_hll`, which is what ANALYZE
    * implementations do); the wide 1-row result melts to the
    * catalog's long (column, stats) shape scan-locally. */
  def columnStats(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax")
    val metrics = cols.flatMap(c => Seq(
      count(col(c)).as(s"n_$c"),
      countDistinct(col(c)).as(s"ndv_$c"),
      min(col(c)).cast("double").as(s"min_$c"),
      max(col(c)).cast("double").as(s"max_$c")))
    val one = graft.Tables.lineitem(spark, dir)
      .agg(metrics.head, metrics.tail: _*)
    one.select(explode(array(cols.map(c => struct(
      lit(c).as("column_name"),
      col(s"n_$c").as("n"),
      col(s"ndv_$c").as("ndv"),
      col(s"min_$c").as("min_d"),
      col(s"max_$c").as("max_d"))): _*)).as("s"))
      .select(col("s.*"))
      .orderBy(col("column_name").asc)
  }

  val columnStatsOracleSql: String = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax")
    cols.map(c =>
      s"""SELECT '$c' AS column_name, count($c) AS n,
         |  count(DISTINCT $c) AS ndv,
         |  CAST(min($c) AS DOUBLE) AS min_d,
         |  CAST(max($c) AS DOUBLE) AS max_d
         |FROM lineitem""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name ASC")
  }

  /** Join-key skew diagnostic — the measurement that decides whether a
    * key needs `saltedCountSum`: per-key frequency of the fact-side
    * join key, the global max/avg skew factor, and the heaviest keys.
    * ONE partial-agg shuffle to key grain; the scalar stats aggregate
    * the key-grain result (broadcast back as a single row). The
    * avg is exact across engines (integer counts). */
  def joinKeySkew(spark: SparkSession, dir: String,
      topK: Int): DataFrame = {
    val counts = graft.Tables.orders(spark, dir)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
    val stats = counts.agg(
      max(col("n_orders")).as("mx"),
      avg(col("n_orders")).as("av"))
    counts.crossJoin(broadcast(stats))
      .select(col("o_custkey"), col("n_orders"),
        round(col("n_orders") / col("av"), 4).as("rel_to_avg"),
        round(col("mx") / col("av"), 4).as("skew_factor"))
      .orderBy(col("n_orders").desc, col("o_custkey").asc)
      .limit(topK)
  }

  def joinKeySkewOracleSql(topK: Int): String =
    s"""WITH c AS (
       |  SELECT o_custkey, count(*) AS n_orders FROM orders
       |  GROUP BY o_custkey
       |), s AS (
       |  SELECT max(n_orders) AS mx, avg(n_orders) AS av FROM c
       |)
       |SELECT o_custkey, n_orders,
       |  round(n_orders / av, 4) AS rel_to_avg,
       |  round(mx / av, 4) AS skew_factor
       |FROM c, s
       |ORDER BY n_orders DESC, o_custkey ASC LIMIT $topK""".stripMargin

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
