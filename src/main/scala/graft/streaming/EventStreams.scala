package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.functions.TextAnalyzer

/** Structured Streaming operators (SURVEY.md §2.8, phase 6).
  *
  * The reference has no stream processing; its closest analogs are the
  * async ingest jobs and the DB trigger that maintains the tsvector
  * index on every insert (/root/reference/src/core/vector_store.py:104-105).
  * Here both become first-class streaming dataflows:
  *
  *  - windowed event aggregation: readStream → watermark → window → agg
  *  - stateful running aggregates: mapGroupsWithState
  *  - continuous index maintenance: foreachBatch merging each micro-batch
  *    into the persisted inverted index (the GIN-trigger analog)
  *
  * Scale notes: watermark + windowed agg is Spark's shuffle-partitioned
  * stateful operator — state is per-key, spillable via RocksDB at real
  * scale. foreachBatch appends partitioned parquet; compaction is a
  * separate concern (Delta/Iceberg in production).
  */
object EventStreams {

  /** The events table's ACTUAL on-disk schema, sniffed with a batch
    * footer read (metadata-only — no data scan). The driver fixture has
    * shipped `ts` both as BIGINT nanoseconds (legacy nanosAsLong) and as
    * TIMESTAMP; pinning a hardcoded schema strands whichever variant is
    * on disk, so the stream schema is always derived from the file. */
  def eventsSchema(spark: SparkSession, dir: String): StructType =
    spark.read.parquet(s"$dir/events.parquet").schema

  /** True when `<dir>/<table>.parquet` is a DIRECTORY of part files
    * (the ScaleUp-generated sf1 fixture layout; the driver's testdata
    * ships single files). FileStreamSource needs a directory either
    * way — the two layouts just differ in which directory to watch and
    * whether a name filter is needed. */
  private[graft] def isPartDir(spark: SparkSession, dir: String,
      table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p).isDirectory
  }

  /** Streaming source over one fixture table, layout-agnostic: a
    * single-file table streams from the fixture dir under a
    * pathGlobFilter; a directory-shaped table (ScaleUp output) streams
    * from the table directory itself. */
  private[graft] def readTable(spark: SparkSession, dir: String,
      table: String, schema: StructType): DataFrame =
    if (isPartDir(spark, dir, table))
      spark.readStream.schema(schema).parquet(s"$dir/$table.parquet")
    else
      spark.readStream.schema(schema)
        .option("pathGlobFilter", s"$table.parquet")
        .parquet(dir)

  /** File-stream source over the events table. The emitted frame always
    * carries an `event_time` TIMESTAMP column normalized from either
    * `ts` dtype ([[graft.Tables.tsTimestamp]]). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val df = readTable(spark, dir, "events", eventsSchema(spark, dir))
    df.withColumn("event_time", graft.Tables.tsTimestamp(df))
  }

  /** Tumbling 10-minute windows per event_type with a 30-minute watermark
    * (late data beyond the watermark is dropped; state is bounded).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "30 minutes")
      .groupBy(window(col("event_time"), "10 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup on event_id with bounded state: duplicates
    * arriving within the watermark horizon are dropped; state for ids
    * older than the watermark is evicted (without the watermark,
    * dropDuplicates state grows with the corpus — unusable at 100 TB;
    * with it, state is O(events per horizon)). The batch analog —
    * first row per id — is the dedup_exact family's streaming face. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Sliding windows (10 min length, 5 min slide) — each event contributes
    * to two windows. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "30 minutes")
      .groupBy(window(col("event_time"), "10 minutes", "5 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  case class UserEvent(user_id: Long, value: Double)
  case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  /** Stateful running per-user totals via mapGroupsWithState — the
    * custom-state operator (B3 job-progress analog re-expressed as
    * streaming state). Emits the updated total for every user seen in
    * the micro-batch.
    */
  def runningUserTotals(spark: SparkSession,
      events: DataFrame): Dataset[UserTotal] = {
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          batch.foreach { e => n += 1; tot += e.value }
          val next = UserTotal(uid, n, tot)
          state.update(next)
          next
      }
  }

  case class SessionEvent(user_id: Long, ts_sec: Long, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, total: Double)
  case class Session(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long, total_value: Double)

  /** Gap-based sessionization via flatMapGroupsWithState: a session is a
    * maximal run of one user's events with inter-event gaps <= gapSec.
    * Sessions CLOSED by an arriving event are emitted; the trailing open
    * session stays in state (it would close on timeout/next batch — the
    * same contract as production session windows).
    */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapSec: Long): Dataset[Session] = {
    import spark.implicits._
    events
      .select(col("user_id"), graft.Tables.tsSeconds(events).as("ts_sec"),
        col("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[SessionEvent],
            state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(_.ts_sec)
          val out = Seq.newBuilder[Session]
          var cur = state.getOption.orNull
          sorted.foreach { e =>
            if (cur == null) {
              cur = SessionState(e.ts_sec, e.ts_sec, 1L, e.value)
            } else if (e.ts_sec - cur.last <= gapSec) {
              cur = SessionState(cur.start, e.ts_sec, cur.n + 1,
                cur.total + e.value)
            } else {
              out += Session(uid, cur.start, cur.last, cur.n, cur.total)
              cur = SessionState(e.ts_sec, e.ts_sec, 1L, e.value)
            }
          }
          if (cur != null) state.update(cur)
          out.result().iterator
      }
  }

  /** Production-contract sessionization: [[sessionize]] plus EVENT-TIME
    * TIMEOUT emission. The plain version only closes a session when a
    * LATER event from the same user arrives — a user who stops clicking
    * leaves their last session in state forever. Here every state update
    * arms a timeout at session_end + gap (+1 s, since an event at
    * exactly `gapSec` still extends); when the watermark passes it, no
    * in-order event can extend the session any more, so it is emitted
    * and its state removed. This closes the stream-vs-batch gap by
    * construction: a session the batch sessionizer considers closed is
    * emitted as soon as the watermark proves it closed, not when (if
    * ever) the user returns. State stays O(open sessions); timed-out
    * keys are freed.
    */
  /** [[SessionEvent]] plus the watermarked event-time column — the
    * unsupported-operation checker requires the watermark attribute to
    * reach the stateful operator's input, so it must survive the typed
    * projection. */
  case class TimedSessionEvent(user_id: Long, ts_sec: Long, value: Double,
      event_time: java.sql.Timestamp)

  def sessionizeWithTimeout(spark: SparkSession, events: DataFrame,
      gapSec: Long, delay: String = "0 seconds"): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("event_time", delay)
      .select(col("user_id"), graft.Tables.tsSeconds(events).as("ts_sec"),
        col("value"), col("event_time"))
      .as[TimedSessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[TimedSessionEvent],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val cur = state.get
            state.remove()
            Iterator.single(Session(uid, cur.start, cur.last, cur.n,
              cur.total))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts_sec)
            val out = Seq.newBuilder[Session]
            var cur = state.getOption.orNull
            sorted.foreach { e =>
              if (cur == null) {
                cur = SessionState(e.ts_sec, e.ts_sec, 1L, e.value)
              } else if (e.ts_sec - cur.last <= gapSec) {
                cur = SessionState(cur.start, e.ts_sec, cur.n + 1,
                  cur.total + e.value)
              } else {
                out += Session(uid, cur.start, cur.last, cur.n, cur.total)
                cur = SessionState(e.ts_sec, e.ts_sec, 1L, e.value)
              }
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp((cur.last + gapSec + 1L) * 1000L)
            }
            out.result().iterator
          }
      }
  }

  case class FunnelEvent(user_id: Long, ts_sec: Long, event_type: String,
      event_time: java.sql.Timestamp)
  case class FunnelProgress(pending: Seq[(Long, String)], tv: Option[Long],
      tc: Option[Long], tp: Option[Long])
  case class FunnelStage(user_id: Long, stage: String, t_sec: Long)

  /** Stateful streaming FUNNEL — the incremental face of the oracled
    * events_funnel batch query (first view → first click AFTER it →
    * first purchase AFTER that, strict inequalities). The hard part is
    * out-of-order arrival: folding an event into the state machine the
    * moment it arrives is wrong, because a still-in-flight EARLIER view
    * could change first-view time and cascade through every later stage.
    * So events BUFFER in state until the watermark passes them — only
    * events no in-order event can precede any more are folded, in
    * event-time order, and each stage transition is emitted exactly
    * once, already final (an Append-mode row, never retracted).
    *
    * Same-timestamp ties fold (ts, type)-sorted — click < purchase <
    * view alphabetically — which reproduces the batch query's strict
    * inequalities: a click sharing its timestamp with the first view is
    * processed while tv is still unset, exactly as `tsec > tv` rejects
    * it in batch.
    *
    * State is O(per-user horizon buffer + 3 longs); the buffer drains
    * to the watermark every trigger. Completed funnels keep their
    * 3-long record so a late replay can't restart stage 1 (a real
    * deployment ages these out with a state TTL).
    */
  def funnelStream(spark: SparkSession, events: DataFrame,
      delay: String = "0 seconds"): Dataset[FunnelStage] = {
    import spark.implicits._
    events
      .withWatermark("event_time", delay)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), graft.Tables.tsSeconds(events).as("ts_sec"),
        col("event_type"), col("event_time"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[FunnelEvent],
            state: GroupState[FunnelProgress]) =>
          val st0 = state.getOption
            .getOrElse(FunnelProgress(Nil, None, None, None))
          val pending = st0.pending ++
            batch.map(e => (e.ts_sec, e.event_type))
          val wmSec = state.getCurrentWatermarkMs() / 1000L
          // an event at ts is final once wm > ts: nothing earlier can
          // still arrive (later rows below the watermark are dropped
          // before this operator)
          val (ready, still) = pending.partition(_._1 < wmSec)
          var tv = st0.tv; var tc = st0.tc; var tp = st0.tp
          val out = Seq.newBuilder[FunnelStage]
          ready.sorted.foreach { case (ts, et) =>
            et match {
              case "view" if tv.isEmpty =>
                tv = Some(ts); out += FunnelStage(uid, "1_view", ts)
              case "click" if tc.isEmpty && tv.exists(ts > _) =>
                tc = Some(ts)
                out += FunnelStage(uid, "2_click_after_view", ts)
              case "purchase" if tp.isEmpty && tc.exists(ts > _) =>
                tp = Some(ts)
                out += FunnelStage(uid, "3_purchase_after_click", ts)
              case _ => ()
            }
          }
          state.update(FunnelProgress(still, tv, tc, tp))
          if (still.nonEmpty) {
            // wake when the watermark can finalize the earliest pending
            // event (never at or below the current watermark)
            state.setTimeoutTimestamp(
              math.max((still.map(_._1).min + 1L) * 1000L,
                wmSec * 1000L + 1000L))
          }
          out.result().iterator
      }
  }

  /** Stream-stream interval join — the remaining §2.8 operator class
    * (windowed aggs, stateful map/flatMap, dedup and foreachBatch are
    * covered elsewhere): click→purchase attribution, each purchase
    * joined to every click by the same user in the preceding
    * `attrWindowSec`. Both sides are watermarked, and the join
    * condition bounds purchase_time to [click_time, click_time +
    * window], so Spark can evict click state once the purchase-side
    * watermark passes click_time + window and purchase state
    * symmetrically — state is O(events per horizon), not O(stream).
    * This is the streaming face of the batch range-join family
    * (Relational range/as-of joins).
    *
    * `joinType` "inner" emits matches as found; "left_outer"
    * additionally emits each unmatched click with null purchase
    * columns — but only once the watermark passes click_time + window,
    * when "no purchase arrived" has become a fact rather than a race
    * (the state-eviction deadline IS the emission trigger).
    */
  def clickAttribution(spark: SparkSession, events: DataFrame,
      attrWindowSec: Long, delay: String = "0 seconds",
      joinType: String = "inner"): DataFrame = {
    val clicks = events
      .filter(col("event_type") === lit("click"))
      .select(col("user_id").as("c_user"),
        graft.Tables.tsSeconds(events).as("click_sec"),
        col("event_id").as("click_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", delay)
    val purchases = events
      .filter(col("event_type") === lit("purchase"))
      .select(col("user_id").as("p_user"),
        graft.Tables.tsSeconds(events).as("purchase_sec"),
        col("event_id").as("purchase_id"),
        col("value").as("purchase_value"),
        col("event_time").as("purchase_time"))
      .withWatermark("purchase_time", delay)
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("purchase_time") > col("click_time") &&
        col("purchase_time") <=
          col("click_time") + expr(s"INTERVAL $attrWindowSec SECONDS"),
      joinType)
      .select(col("c_user").as("user_id"), col("click_id"),
        col("click_sec"), col("purchase_id"), col("purchase_sec"),
        col("purchase_value"))
  }

  /** Quality-gated continuous ingest — the streaming face of the batch
    * curation gate: each arriving micro-batch of documents is scored
    * with the Gopher rule set (graft.operators.TextOps.gopherRuleCount,
    * the same Column the oracled quality_gopher/select_budget queries
    * use) and split — full-pass docs land in accepted/, the rest in
    * rejected/ with their grade attached for inspection. Batches write
    * into batch_id partitions with overwrite, so an at-least-once
    * replay is a no-op (same idempotence contract as
    * [[indexMaintenance]]). Returns the DataStreamWriter (caller sets
    * the trigger and starts).
    */
  def qualityGatedIngest(spark: SparkSession, docsDir: String,
      outDir: String, checkpointDir: String) = {
    val docSchema =
      spark.read.parquet(s"$docsDir/documents.parquet").schema
    readTable(spark, docsDir, "documents", docSchema)
      .withColumn("q", graft.operators.TextOps.gopherRuleCount)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val scored = batch.persist()
        scored.filter(col("q") === lit(5)).drop("q")
          .write.mode("overwrite")
          .parquet(s"$outDir/accepted/batch_id=$batchId")
        scored.filter(col("q") < lit(5))
          .write.mode("overwrite")
          .parquet(s"$outDir/rejected/batch_id=$batchId")
        scored.unpersist()
        ()
      }
  }

  /** Continuous inverted-index maintenance: each micro-batch of documents
    * is analyzed and appended to the index directory — the Spark analog
    * of the reference's tsvector-populating DB trigger. Returns the
    * StreamingQuery (caller awaits/stops).
    */
  def indexMaintenance(spark: SparkSession, docsDir: String,
      indexOutDir: String, checkpointDir: String) = {
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    readTable(spark, docsDir, "documents", docSchema)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Idempotent commit: foreachBatch is at-least-once, so a restart
        // can replay a batch whose write already succeeded. Writing each
        // batch into its own batch_id partition with overwrite makes the
        // replay a no-op instead of doubling tf rows.
        batch
          .select(col("doc_id"), col("lang"),
            posexplode(TextAnalyzer.tokens(col("text")))
              .as(Seq("pos", "term")))
          .groupBy("doc_id", "lang", "term")
          .agg(count(lit(1)).as("tf"),
            sort_array(collect_list(col("pos"))).as("positions"))
          .write.mode("overwrite")
          .parquet(s"$indexOutDir/batch_id=$batchId")
        ()
      }
  }
}
