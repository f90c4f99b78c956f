package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStreams

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def runToMemory(df: org.apache.spark.sql.DataFrame,
      name: String, mode: String): Unit = {
    val q = df.writeStream
      .format("memory").queryName(name).outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory(s"ckpt_$name").toString)
      .start()
    q.awaitTermination(120000)
  }

  test("windowed counts match the batch computation up to the watermark") {
    runToMemory(
      EventStreams.windowedCounts(EventStreams.readEvents(spark, Sf0001)),
      "win_counts", "append")
    val streamed = spark.table("win_counts")
      .select($"window_start", $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val evTbl = Tables.events(spark, Sf0001)
    val batchRows = evTbl
      .withColumn("event_time", Tables.tsTimestamp(evTbl))
      .groupBy(window($"event_time", "10 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), max($"event_time").as("mx"))
      .select($"window.start".as("ws"), $"window.end".as("we"),
        $"event_type", $"n")
      .as[(java.sql.Timestamp, java.sql.Timestamp, String, Long)].collect()
    val batch = batchRows.map(r => (r._1, r._3) -> r._4).toMap
    val maxTs = evTbl
      .select(max(Tables.tsTimestamp(evTbl)))
      .collect()(0).getTimestamp(0)
    val cutoff = maxTs.getTime - 30 * 60 * 1000
    // append mode: windows closed by the final watermark must be emitted
    // with exact batch counts; trailing windows may be withheld in state
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, n) => assert(batch(k) == n) }
    batchRows.filter(_._2.getTime < cutoff).foreach { r =>
      assert(streamed.contains((r._1, r._3)),
        s"window ${r._1}/${r._3} should have been emitted")
    }
  }

  test("streaming dedup drops duplicate event_ids with bounded state") {
    // source with planted duplicates: the events file read twice through
    // a union would need two sources; instead duplicate rows via a
    // written copy containing each event twice
    val dir = Files.createTempDirectory("dupev").toString
    val ev = Tables.events(spark, Sf0001).limit(200)
    ev.union(ev).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/staging")
    // rename to match the source's glob
    val part = new java.io.File(s"$dir/staging").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    runToMemory(
      EventStreams.dedupedEvents(EventStreams.readEvents(spark, dir)),
      "dedup_stream", "append")
    val got = spark.table("dedup_stream")
    assert(got.count() == got.select("event_id").distinct().count())
    assert(got.count() == 200)
  }

  test("sliding windows: emitted window counts match batch; 2 windows per event") {
    runToMemory(
      EventStreams.slidingCounts(EventStreams.readEvents(spark, Sf0001)),
      "slide_counts", "append")
    val streamed = spark.table("slide_counts")
      .select($"window_start", $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val evTbl = Tables.events(spark, Sf0001)
    val batch = evTbl
      .withColumn("event_time", Tables.tsTimestamp(evTbl))
      .groupBy(window($"event_time", "10 minutes", "5 minutes"),
        $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("ws"), $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, n) => assert(batch(k) == n) }
    // each event contributes to exactly 2 sliding windows in the batch view
    assert(batch.values.sum ==
      2 * Tables.events(spark, Sf0001).count())
  }

  test("stateful running totals accumulate per user") {
    runToMemory(
      EventStreams.runningUserTotals(spark,
        EventStreams.readEvents(spark, Sf0001)).toDF(),
      "user_totals", "update")
    val streamed = spark.table("user_totals")
      .select($"user_id", $"n_events").as[(Long, Long)]
      .collect().toMap
    val batch = Tables.events(spark, Sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(streamed == batch)
  }

  test("sessionization matches a batch lag/cumsum computation (closed sessions)") {
    val gap = 7200L
    val q = EventStreams.sessionize(
      spark, EventStreams.readEvents(spark, Sf0001), gap).toDF()
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_sess").toString)
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("sessions")
      .select($"user_id", $"session_start", $"n_events")
      .as[(Long, Long, Long)].collect().toSet

    // batch ground truth: lag -> boundary flag -> cumulative session id
    val evTbl = Tables.events(spark, Sf0001)
    evTbl
      .select($"user_id", Tables.tsSeconds(evTbl).as("ts_sec"), $"value")
      .createOrReplaceTempView("ev_sess")
    val batchAll = spark.sql(
      s"""WITH flagged AS (
         |  SELECT user_id, ts_sec,
         |    CASE WHEN ts_sec - lag(ts_sec) OVER
         |      (PARTITION BY user_id ORDER BY ts_sec) > $gap
         |      THEN 1 ELSE 0 END AS boundary
         |  FROM ev_sess
         |), numbered AS (
         |  SELECT user_id, ts_sec,
         |    sum(boundary) OVER (PARTITION BY user_id ORDER BY ts_sec)
         |      AS session_id
         |  FROM flagged
         |)
         |SELECT user_id, min(ts_sec) AS session_start,
         |  count(*) AS n_events,
         |  max(session_id) OVER (PARTITION BY user_id) AS last_sid,
         |  session_id
         |FROM numbered GROUP BY user_id, session_id""".stripMargin)
    val closed = batchAll
      .filter($"session_id" =!= $"last_sid") // trailing session stays open
      .select($"user_id", $"session_start", $"n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == closed)
    assert(streamed.nonEmpty)
  }

  test("registered events_sessions query: sessions partition each user's events") {
    val sess = graft.operators.Relational
      .eventSessions(spark, Sf0001, 1800L).collect()
    assert(sess.nonEmpty)
    val total = sess.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, Sf0001).count()) // partition, no loss
    sess.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("session_seq"))
      // session_seq is 1..n dense per user
      assert(ordered.map(_.getAs[Long]("session_seq")).toSeq ==
        (1L to ordered.length).toSeq)
      // consecutive sessions are separated by more than the gap
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_sec") - a.getAs[Long]("end_sec") > 1800L)
        case _ =>
      }
    }
  }

  test("stream-vs-batch gate: streamed windows equal the ORACLED " +
      "events_tumbling rows") {
    // the streaming analog of a correctness row: the streamed windowed
    // aggregate must reproduce the hash-gated batch query's rows
    // (Relational.eventsTumbling — the registered events_tumbling
    // entry), keyed to its bucket convention (epoch sec div 600)
    runToMemory(
      EventStreams.windowedCounts(EventStreams.readEvents(spark, Sf0001)),
      "win_gate", "append")
    val streamed = spark.table("win_gate")
      .select(
        expr("CAST(floor(unix_timestamp(window_start) / 600) AS LONG)")
          .as("bucket"),
        $"event_type", $"n", $"sum_value")
      .as[(Long, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(streamed.nonEmpty)
    val oracled = graft.operators.Relational
      .eventsTumbling(spark, Sf0001)
      .as[(Long, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // every emitted (closed) window row must equal the oracled row:
    // counts exactly; sums to 1e-6 (cross-micro-batch state
    // accumulation order can differ from the batch sum at ~1e-12)
    streamed.foreach { case (k, (n, sv)) =>
      val (on, osv) = oracled(k)
      assert(n == on, s"count mismatch at $k")
      assert(math.abs(sv - osv) < 1e-6, s"sum mismatch at $k")
    }
    // and completeness: windows closed by the final watermark are there
    val evTbl = Tables.events(spark, Sf0001)
    val maxTs = evTbl
      .select(max(Tables.tsSeconds(evTbl))).as[Long].collect()(0)
    val cutoffBucket = (maxTs - 30 * 60) / 600
    oracled.keys.filter(_._1 < cutoffBucket - 1).foreach { k =>
      assert(streamed.contains(k), s"closed window $k missing")
    }
  }

  test("timeout sessionization: streamed sessions reproduce the ORACLED " +
      "events_sessions rows") {
    // gate against the REGISTERED (hash-gated) batch query, not an
    // ad-hoc ground truth: every session the watermark can prove closed
    // must be emitted (the plain sessionizer leaves each user's trailing
    // session in state forever), and nothing may be emitted that the
    // batch sessionizer doesn't produce
    val gap = 1800L
    runToMemory(
      EventStreams.sessionizeWithTimeout(
        spark, EventStreams.readEvents(spark, Sf0001), gap).toDF(),
      "sess_timeout", "append")
    val streamed = spark.table("sess_timeout")
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed.nonEmpty)
    val batch = graft.operators.Relational
      .eventSessions(spark, Sf0001, gap)
      .select($"user_id", $"start_sec", $"end_sec", $"n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed.subsetOf(batch),
      s"streamed-only sessions: ${streamed -- batch}")
    // completeness: the final watermark is max(ts) (delay 0s); any
    // session whose timeout (end + gap + 1) lies strictly below it has
    // provably closed and MUST have been emitted
    val evTbl = Tables.events(spark, Sf0001)
    val maxTs = evTbl
      .select(max(Tables.tsSeconds(evTbl))).as[Long].collect()(0)
    val mustClose = batch.filter { case (_, _, end, _) =>
      end + gap + 2 < maxTs
    }
    assert(mustClose.nonEmpty, "fixture premise: some session must close")
    assert(mustClose.subsetOf(streamed),
      s"provably-closed sessions not emitted: ${mustClose -- streamed}")
    // and the timeout path is load-bearing: at least one emitted session
    // is its user's LAST (no later event ever closes it)
    val lastPerUser = batch.groupBy(_._1).map { case (_, ss) =>
      ss.maxBy(_._3)
    }.toSet
    assert((streamed & lastPerUser).nonEmpty,
      "no trailing session emitted — the timeout never fired")
  }

  test("stateful streaming funnel reproduces the batch first-after chain " +
      "(out-of-order safe)") {
    runToMemory(
      EventStreams.funnelStream(
        spark, EventStreams.readEvents(spark, Sf0001)).toDF(),
      "funnel_stream", "append")
    val streamed = spark.table("funnel_stream")
      .select($"user_id", $"stage", $"t_sec")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed.nonEmpty)
    // per-user ground truth from the same SQL shape the ORACLED
    // events_funnel aggregates (it publishes only stage counts; the
    // gate needs the per-user transition times)
    val evTbl = Tables.events(spark, Sf0001)
    evTbl
      .select($"user_id", Tables.tsSeconds(evTbl).as("tsec"),
        $"event_type")
      .createOrReplaceTempView("ev_funnel")
    val truth = spark.sql(
      """WITH v AS (
        |  SELECT user_id, min(tsec) AS t FROM ev_funnel
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, min(e.tsec) AS t
        |  FROM ev_funnel e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.tsec > v.t
        |  GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, min(e.tsec) AS t
        |  FROM ev_funnel e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.tsec > c.t
        |  GROUP BY e.user_id
        |)
        |SELECT user_id, '1_view' AS stage, t FROM v
        |UNION ALL SELECT user_id, '2_click_after_view', t FROM c
        |UNION ALL SELECT user_id, '3_purchase_after_click', t FROM p
        |""".stripMargin)
      .as[(Long, String, Long)].collect().toSet
    // the final watermark is max(ts) (delay 0): transitions strictly
    // below it are final and MUST match; transitions at max(ts) are
    // legitimately still pending in stream state
    val maxTs = evTbl
      .select(max(Tables.tsSeconds(evTbl))).as[Long].collect()(0)
    val finalTruth = truth.filter(_._3 < maxTs)
    assert(streamed == finalTruth,
      s"streamed-only: ${streamed -- finalTruth}; " +
        s"missing: ${finalTruth -- streamed}")
    // every stage must be represented or the gate is vacuous
    assert(Set("1_view", "2_click_after_view", "3_purchase_after_click")
      .subsetOf(streamed.map(_._2)))
  }

  test("funnel folds late-arriving earlier events correctly " +
      "(click/purchase delivered before their view)") {
    // a fold-on-arrival funnel would reject the click (no view yet) and
    // the purchase (no click); the buffer-until-watermark design must
    // recover the full chain once the view arrives in a LATER batch
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, String)]
    val df = ms.toDF()
      .selectExpr("_1 AS user_id", "_2 * 1000000000 AS ts",
        "_3 AS event_type")
      .withColumn("event_time", expr("timestamp_micros(ts div 1000)"))
    val q = EventStreams.funnelStream(spark, df, "500 seconds").toDF()
      .writeStream.format("memory").queryName("funnel_ooo")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_funnel_ooo").toString)
      .start()
    try {
      ms.addData((1L, 300L, "purchase"), (1L, 200L, "click"))
      q.processAllAvailable()
      ms.addData((1L, 100L, "view")) // the EARLIER event, one batch later
      q.processAllAvailable()
      // watermark pusher: 1000 - 500s delay = 500 > every user-1 event
      ms.addData((99L, 1000L, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("funnel_ooo")
      .select($"user_id", $"stage", $"t_sec")
      .as[(Long, String, Long)].collect().toSet
    assert(rows == Set(
      (1L, "1_view", 100L),
      (1L, "2_click_after_view", 200L),
      (1L, "3_purchase_after_click", 300L)), s"got: $rows")
  }

  test("stream-stream interval join: click attribution equals the batch " +
      "range join") {
    val win = 3600L
    runToMemory(
      EventStreams.clickAttribution(
        spark, EventStreams.readEvents(spark, Sf0001), win),
      "attr_stream", "append")
    val streamed = spark.table("attr_stream")
      .select($"user_id", $"click_id", $"purchase_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed.nonEmpty)
    // batch ground truth with the IDENTICAL join condition (an inner
    // stream-stream join emits every match found in-batch, so with the
    // fixture arriving as one micro-batch the sets must be EQUAL — the
    // watermark bounds state, not results)
    val evTbl = Tables.events(spark, Sf0001)
    val ev = evTbl
      .withColumn("event_time", Tables.tsTimestamp(evTbl))
      .withColumn("sec", Tables.tsSeconds(evTbl))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("click_id"),
        $"sec".as("c_sec"), $"event_time".as("c_time"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("purchase_id"),
        $"sec".as("p_sec"), $"event_time".as("p_time"))
    val batch = c.join(p,
      $"c_user" === $"p_user" && $"p_time" > $"c_time" &&
        $"p_time" <= $"c_time" + expr(s"INTERVAL $win SECONDS"))
      .select($"c_user", $"click_id", $"purchase_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"streamed-only: ${streamed -- batch}; missing: ${batch -- streamed}")
  }

  test("left-outer stream-stream join: unmatched clicks emit nulls only " +
      "once the watermark proves no purchase can arrive") {
    val win = 3600L
    runToMemory(
      EventStreams.clickAttribution(
        spark, EventStreams.readEvents(spark, Sf0001), win,
        joinType = "left_outer"),
      "attr_outer", "append")
    val outer = spark.table("attr_outer")
    val matched = outer.filter($"purchase_id".isNotNull)
      .select($"click_id").as[Long].collect().toSet
    val unmatched = outer.filter($"purchase_id".isNull)
      .select($"click_id", $"click_sec").as[(Long, Long)].collect()
    assert(unmatched.nonEmpty)
    // no click appears both matched and null-extended
    assert(unmatched.map(_._1).toSet.intersect(matched).isEmpty)
    // batch truth: clicks with zero purchases in their window
    val evTbl = Tables.events(spark, Sf0001)
    val ev = evTbl
      .withColumn("event_time", Tables.tsTimestamp(evTbl))
      .withColumn("sec", Tables.tsSeconds(evTbl))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("click_id"),
        $"sec".as("c_sec"), $"event_time".as("c_time"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("purchase_id"),
        $"event_time".as("p_time"))
    val batchUnmatched = c.join(p,
      $"c_user" === $"p_user" && $"p_time" > $"c_time" &&
        $"p_time" <= $"c_time" + expr(s"INTERVAL $win SECONDS"),
      "left_anti")
      .select($"click_id", $"c_sec").as[(Long, Long)].collect()
      .map(_._1).toSet
    // every streamed null-extension is a true no-purchase click...
    assert(unmatched.map(_._1).toSet.subsetOf(batchUnmatched))
    // ...and completeness for clicks whose window the final watermark
    // has provably closed. The GLOBAL watermark is the MIN of the two
    // sides' watermarks (each side's EventTimeWatermark tracks only its
    // own filtered stream), so the final value is min(max click ts,
    // max purchase ts), not the overall max
    val wmFinal = ev
      .filter($"event_type".isin("click", "purchase"))
      .groupBy($"event_type")
      .agg(max($"sec").as("m"))
      .select(min($"m")).as[Long].collect()(0)
    val provable = c.select($"click_id", $"c_sec").as[(Long, Long)]
      .collect()
      .filter { case (id, sec) =>
        batchUnmatched.contains(id) && sec + win + 2 < wmFinal
      }.map(_._1).toSet
    assert(provable.nonEmpty, "fixture premise: some closed-window miss")
    assert(provable.subsetOf(unmatched.map(_._1).toSet),
      s"missing null-extensions: ${provable -- unmatched.map(_._1).toSet}")
  }

  test("fixture guard: every streaming entry point analyzes against the " +
      "REAL driver fixture AND a BIGINT-nanos variant") {
    // Round-8 regression: the module pinned `ts` to LongType nanos while
    // the driver fixture shipped TIMESTAMP — every streaming test failed
    // analysis. This guard runs each entry point's ANALYSIS against the
    // real on-disk schema (whatever the driver ships) plus the legacy
    // nanos-long schema, so a fixture dtype change can never strand §2.8
    // again without failing here by name.
    val evTbl = Tables.events(spark, Sf0001)
    val dir = Files.createTempDirectory("ev_nanos").toString
    evTbl.select($"event_id",
        (Tables.tsSeconds(evTbl) * lit(1000000000L)).as("ts"),
        $"user_id", $"event_type", $"value", $"props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/staging")
    val part = new java.io.File(s"$dir/staging").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))

    for (src <- Seq(EventStreams.readEvents(spark, Sf0001),
        EventStreams.readEvents(spark, dir))) {
      // .analyzed forces resolution — the exact phase the round-8 break
      // failed in (DATATYPE_MISMATCH at analysis, not execution)
      EventStreams.windowedCounts(src).queryExecution.analyzed
      EventStreams.slidingCounts(src).queryExecution.analyzed
      EventStreams.dedupedEvents(src).queryExecution.analyzed
      EventStreams.runningUserTotals(spark, src).queryExecution.analyzed
      EventStreams.sessionize(spark, src, 1800L).queryExecution.analyzed
      EventStreams.sessionizeWithTimeout(spark, src, 1800L)
        .queryExecution.analyzed
      EventStreams.funnelStream(spark, src).queryExecution.analyzed
      EventStreams.clickAttribution(spark, src, 3600L)
        .queryExecution.analyzed
    }

    // and one end-to-end execution on the nanos variant: the two dtypes
    // must produce IDENTICAL windowed aggregates
    runToMemory(
      EventStreams.windowedCounts(EventStreams.readEvents(spark, dir)),
      "win_nanos", "append")
    runToMemory(
      EventStreams.windowedCounts(EventStreams.readEvents(spark, Sf0001)),
      "win_real", "append")
    val a = spark.table("win_nanos")
      .select($"window_start", $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val b = spark.table("win_real")
      .select($"window_start", $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(a.nonEmpty && a == b)
  }

  test("quality-gated streaming ingest splits exactly as the batch gate") {
    val out = Files.createTempDirectory("gate_out").toString
    val ckpt = Files.createTempDirectory("gate_ckpt").toString
    val q = EventStreams.qualityGatedIngest(spark, Sf0001, out, ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val accepted = spark.read.parquet(s"$out/accepted")
      .select($"doc_id").as[Long].collect().toSet
    val rejected = spark.read.parquet(s"$out/rejected")
      .select($"doc_id").as[Long].collect().toSet
    val batchPass = graft.operators.TextOps.gopherQuality(spark, Sf0001)
      .filter($"pass").select($"doc_id").as[Long].collect().toSet
    val all = Tables.documents(spark, Sf0001)
      .select($"doc_id").as[Long].collect().toSet
    assert(accepted == batchPass)
    assert(accepted ++ rejected == all)
    assert(accepted.intersect(rejected).isEmpty)
    // rejected rows carry their grade for inspection
    val grades = spark.read.parquet(s"$out/rejected")
      .select($"q").as[Long].collect()
    assert(grades.nonEmpty && grades.forall(g => g >= 0 && g < 5))
  }

  test("foreachBatch index maintenance builds the same index as batch") {
    val out = Files.createTempDirectory("idx_out").toString + "/idx"
    val ckpt = Files.createTempDirectory("idx_ckpt").toString
    val q = EventStreams.indexMaintenance(spark, Sf0001, out, ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
    val batch = graft.operators.Fts.invertedIndex(
      Tables.documents(spark, Sf0001))
    assert(streamed.count() == batch.count())
    val joined = streamed.select($"doc_id", $"term", $"tf".as("tf_s"))
      .join(batch.select($"doc_id", $"term", $"tf".as("tf_b")),
        Seq("doc_id", "term"))
    assert(joined.filter($"tf_s" =!= $"tf_b").count() == 0)

    // compaction: batch partitions fold into the bucketed table shape,
    // and a later batch's postings REPLACE the doc's older ones
    val someDoc = streamed.select($"doc_id").as[Long].first()
    spark.createDataset(Seq(
        (someDoc, "en", "replacementterm", 7L, Seq(0))))
      .toDF("doc_id", "lang", "term", "tf", "positions")
      .write.mode("overwrite").parquet(s"$out/batch_id=999")
    graft.operators.Fts.compactStreamedIndex(spark, out, "graft_fts_compact_t")
    val compacted = spark.table("graft_fts_compact_t")
    // replaced doc has ONLY the new posting; all other docs unchanged
    assert(compacted.filter($"doc_id" === someDoc).count() == 1)
    assert(compacted.filter($"doc_id" === someDoc)
      .select($"term").as[String].first() == "replacementterm")
    assert(compacted.filter($"doc_id" =!= someDoc).count() ==
      streamed.filter($"doc_id" =!= someDoc).count())
    // the compacted relation is genuinely bucketed (probe-ready)
    val scanStr = compacted.queryExecution.executedPlan.toString
    assert(scanStr.contains("Bucketed: true") ||
      scanStr.contains("SelectedBucketsCount"),
      s"compacted table not bucketed:\n$scanStr")
  }

  test("layout-agnostic sources: a directory-shaped events table " +
      "(the ScaleUp sf1 layout) streams to the same bridge rows as " +
      "the single-file fixture") {
    // replicate the fixture into the OTHER on-disk layout:
    // <dir>/events.parquet as a DIRECTORY of part files
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_layout_t").toString
    try {
      Tables.events(spark, Sf0001).repartition(3)
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      assert(graft.streaming.EventStreams
        .isPartDir(spark, tmp, "events"))
      val fromDir = graft.streaming.StreamBridge
        .eventsTumblingStream(spark, tmp)
        .collect().map(_.toString).toSeq
      val fromFile = graft.streaming.StreamBridge
        .eventsTumblingStream(spark, Sf0001)
        .collect().map(_.toString).toSeq
      assert(fromDir == fromFile && fromDir.nonEmpty)
    } finally {
      graft.sources.ParquetStore.deleteRecursively(
        java.nio.file.Paths.get(tmp))
    }
  }

  test("state-store portability: the merging-state bridge produces " +
      "identical rows under the RocksDB provider") {
    // HDFSBackedStateStoreProvider (the default) holds state on the
    // executor heap — fine at fixture scale, not at a 100 TB horizon.
    // The deployment answer is RocksDB (state spills to local disk,
    // bounded heap); this pins that the SAME bridge code produces the
    // SAME rows under it, so switching providers at scale is a config
    // change, not a semantics change. Session windows are the MERGING
    // state class — the provider's hardest case.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val rocks = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val base = graft.streaming.StreamBridge
      .eventsSessionsStream(spark, Sf0001)
      .collect().map(_.toString).toSeq
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, rocks)
    try {
      val rocksRows = graft.streaming.StreamBridge
        .eventsSessionsStream(spark, Sf0001)
        .collect().map(_.toString).toSeq
      assert(rocksRows == base)
      assert(base.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("bridge memos are session-scoped: a SECOND session in the same " +
      "JVM re-runs the family and reads correct tallies/sinks") {
    // r13/r14 ADVICE: the family memo caches SparkSession-scoped
    // memory-sink temp views keyed JVM-statically. A dir-keyed memo
    // gives a recreated session 'table not found'; a SparkSession-keyed
    // strong map retains the session graph forever. The contract: a new
    // session transparently re-runs the family and gets the same rows.
    val first = graft.streaming.StreamBridge
      .streamUserGrowth(spark, Sf0001)
      .collect().map(_.toString).toSeq
    val s2 = spark.newSession()
    graft.functions.NativeFunctions.registerAll(s2)
    val second = graft.streaming.StreamBridge
      .streamUserGrowth(s2, Sf0001)
      .collect().map(_.toString).toSeq
    assert(second == first && first.nonEmpty,
      "second session must rebuild its own tallies, same values")
    // and a memory-sink bridge resolves against the NEW session's
    // catalog (its temp views are invisible across sessions)
    val tumbling = graft.streaming.StreamBridge
      .eventsTumblingStream(s2, Sf0001)
      .collect().map(_.toString).toSeq
    assert(tumbling ==
      graft.streaming.StreamBridge.eventsTumblingStream(spark, Sf0001)
        .collect().map(_.toString).toSeq)
  }
}
