package graft

import org.apache.spark.sql.DataFrame

import graft.operators.ProductQuant
import graft.streaming.StreamBridge

/** Round-10 surface: streaming→batch bridges (the §2.8 operators under
  * the correctness oracle), PQ recall self-evaluation, and the
  * relation-cache invalidation hook. */
class Round10OpsSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("events_tumbling_stream: micro-batch execution emits exactly " +
      "the batch tumbling-window frame") {
    val stream = StreamBridge.eventsTumblingStream(spark, Sf0001)
    val batch = graft.operators.Relational.eventsTumbling(spark, Sf0001)
    assert(stream.columns.toSeq == batch.columns.toSeq)
    assert(rows(stream) == rows(batch))
  }

  test("stream_index_termstats: streamed+compacted index yields the " +
      "batch index's term statistics") {
    val stream = StreamBridge.streamIndexTermStats(spark, Sf0001)
    val batch = graft.operators.Fts.termStats(spark, Sf0001)
    assert(stream.columns.toSeq == batch.columns.toSeq)
    assert(rows(stream) == rows(batch))
  }

  test("events_late_drop_stream: emitted windows match an independent " +
      "driver-side replay of the watermark contract, and drops occur") {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    val evDf = Tables.events(spark, Sf0001)
    val usCol = evDf.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    val ev = evDf.select(col("event_id"), col("event_type"),
        col("value"), usCol.cast("long").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val lo = ev.map(_._4).min; val hi = ev.map(_._4).max
    val span = hi - lo + 1L
    val B = StreamBridge.LateB
    def arrival(id: Long, us: Long): Int = {
      val chunk = ((us - lo) * B / span).toInt
      if (id % StreamBridge.LateMod == 0)
        math.min(chunk + StreamBridge.LateJump, B - 1)
      else chunk
    }
    val tagged = ev.map { case (id, tp, v, us) => (arrival(id, us), tp, v, us) }
    val bmax = tagged.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._4).max }
    // the late filter in batch b uses the watermark IN FORCE DURING
    // batch b-1, i.e. data through batch b-2 (the two-watermark
    // contract the bridge documents): ms-floored max - 30 min
    def wmBefore(b: Int): Long =
      (0 until math.max(0, b - 1)).flatMap(bmax.get) match {
        case s if s.isEmpty => Long.MinValue
        case s => (s.max / 1000L - 30L * 60L * 1000L) * 1000L
      }
    val wmFinal = (hi / 1000L - 30L * 60L * 1000L) * 1000L
    def wend(us: Long): Long = (us / 600000000L + 1L) * 600000000L
    val kept = tagged.filter { case (b, _, _, us) => wend(us) > wmBefore(b) }
    val expected = kept
      .filter { case (_, _, _, us) => wend(us) <= wmFinal }
      .groupBy { case (_, tp, _, us) => (us / 600000000L, tp) }
      .map { case ((bucket, tp), rs) =>
        (bucket, tp) -> (rs.length.toLong, rs.map(_._3).sum) }
    val got = StreamBridge.eventsLateDropStream(spark, Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, (n, sum)) =>
      assert(got(k)._1 == n, s"count mismatch at $k")
      assert(math.abs(got(k)._2 - sum) < 1e-3, s"sum mismatch at $k")
    }
    // the contract is only interesting if the replay actually exercised
    // it: some rows dropped as late, some windows withheld past the
    // final watermark
    val total = ev.length.toLong
    val emitted = got.values.map(_._1).sum
    assert(kept.length < total, "no late rows were dropped")
    assert(emitted < kept.length, "no windows were withheld at the tail")
  }

  test("events_sessions_stream: Append-mode session_window emits " +
      "exactly the closed sessions of a driver-side gap replay") {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    val evDf = Tables.events(spark, Sf0001)
    val usCol = evDf.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    val ev = evDf.select(col("user_id"), col("value"),
        usCol.cast("long").as("us"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val gap = 1800L * 1000000L
    val wmf = (ev.map(_._3).max / 1000L - 1800000L) * 1000L
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (uid, rs) =>
      val sorted = rs.sortBy(_._3)
      val sessions = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[(Long, Double, Long)]]
      sorted.foreach { r =>
        if (sessions.isEmpty || r._3 - sessions.last.last._3 >= gap)
          sessions += scala.collection.mutable.ArrayBuffer(r)
        else sessions.last += r
      }
      sessions.map { s =>
        (s.head._3, s.last._3 + gap, uid, s.length.toLong,
          s.map(_._2).sum)
      }
    }.filter(_._2 <= wmf).sortBy(s => (s._3, s._1))
    val got = StreamBridge.eventsSessionsStream(spark, Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 &&
        g._4 == e._4, s"session mismatch: $g vs $e")
      assert(math.abs(g._5 - e._5) < 1e-3)
    }
    // tail sessions (still open at the final watermark) are withheld
    val allSessions = ev.groupBy(_._1).values
      .map(_.sortBy(_._3)).toSeq
    assert(expected.length < allSessions.map(_.size).sum,
      "sanity: emitted sessions should be fewer than events")
  }

  test("stream_click_attrib: micro-batch stream-stream join emits " +
      "exactly the batch interval join at microsecond precision") {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    val streamed = StreamBridge
      .streamClickAttribution(spark, Sf0001, 3600L)
      .collect().map(_.toSeq).toSeq
    val evDf = Tables.events(spark, Sf0001)
    val usCol = evDf.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    val e = evDf.select(col("event_id"), col("user_id"),
      col("event_type"), col("value"),
      Tables.tsSeconds(evDf).cast("long").as("sec"),
      usCol.cast("long").as("us"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("sec").as("click_sec"), col("us").as("c_us"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"),
        col("sec").as("purchase_sec"),
        col("value").as("purchase_value"), col("us").as("p_us"))
    val batch = c.join(p, col("user_id") === col("p_user") &&
        col("p_us") > col("c_us") &&
        col("p_us") <= col("c_us") + 3600L * 1000000L)
      .select(col("user_id"), col("click_id"), col("click_sec"),
        col("purchase_id"), col("purchase_sec"), col("purchase_value"))
      .orderBy(col("click_id").asc, col("purchase_id").asc)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("pq_recall: full exact list per query, recall within [0, 1e6]") {
    val out = ProductQuant.pqRecall(spark, Sf0001,
      Seq(3L, 7L, 11L), 10).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_exact") == 10L)
      val rm = r.getAs[Long]("recall_micro")
      assert(rm >= 0L && rm <= 1000000L)
      assert(rm == r.getAs[Long]("n_common") * 1000000L / 10L)
    }
  }

  test("embedding client retry envelope: timeouts retry, hard errors " +
      "fall back, attempt counts match the batch's failure classes") {
    import graft.operators.EmbeddingClient
    val bs = 32
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val got = EmbeddingClient.embedCorpusRetrying(spark, Sf0001, bs)
      .collect().map(r => r.doc_id -> ((r.origin, r.attempts))).toMap
    docs.grouped(bs).foreach { batch =>
      val err = batch.exists(_ % EmbeddingClient.RemoteFailMod == 0)
      val tmo = batch.exists(_ % EmbeddingClient.RemoteTimeoutMod == 0)
      val expect =
        if (err) ("local", 1) else if (tmo) ("remote", 2) else ("remote", 1)
      batch.foreach(id => assert(got(id) == expect,
        s"doc $id: ${got(id)} != $expect"))
    }
    // the fixture must exercise all three outcomes or the test is vacuous
    val outcomes = got.values.toSet
    assert(outcomes.contains(("local", 1)) &&
      outcomes.contains(("remote", 2)) &&
      outcomes.contains(("remote", 1)), s"outcomes seen: $outcomes")
  }

  test("awaitReady: counts attempts, records the backoff schedule, " +
      "gives up at maxAttempts") {
    import graft.operators.EmbeddingClient.awaitReady
    val (ok, n, waits) = awaitReady(_ >= 4, maxAttempts = 30, 5000L)
    assert(ok && n == 4 && waits == Seq(5000L, 5000L, 5000L))
    val (ok2, n2, waits2) = awaitReady(_ => false, maxAttempts = 5, 100L)
    assert(!ok2 && n2 == 5 && waits2.length == 4)
  }

  test("corpus_datacard: per-(source, lang) counts agree with a " +
      "driver-side recount of the fixture") {
    val docs = Tables.documents(spark, Sf0001)
      .select("source", "lang", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    val card = graft.operators.Datacard.corpusDatacard(spark, Sf0001)
      .collect()
    assert(card.map(_.getAs[Long]("n_docs")).sum == docs.length)
    card.foreach { r =>
      val grp = docs.filter(d =>
        d._1 == r.getString(0) && d._2 == r.getString(1))
      assert(r.getAs[Long]("n_docs") == grp.length)
      assert(r.getAs[Long]("n_dup_docs") ==
        grp.length - grp.map(_._3).distinct.length)
      val chars = grp.map(_._4).sorted
      assert(r.getAs[Double]("avg_chars") ==
        math.round(chars.sum.toDouble / chars.length * 1e4) / 1e4)
    }
    // groups are sorted (source asc, lang asc)
    val keys = card.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted)
  }

  test("retrieval_ndcg: micro-DCG matches a hand fold over the BM25 " +
      "top-k; idcg bounds dcg; mrr names the first full match") {
    val query = "hash join merge"; val k = 10
    val terms = graft.functions.TextAnalyzer.analyze(query).distinct
    val top = graft.operators.Fts.searchBm25(spark, Sf0001, query, "en", k)
      .collect().map(_.getLong(0))
    // independent grade: fixture words are space-separated plain tokens
    val text = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSet).toMap
    val grades = top.map(id => terms.count(text(id).contains))
    def fold(gs: Seq[Int]): Long = gs.zipWithIndex.map { case (g, i) =>
      math.round((math.pow(2.0, g) - 1.0) /
        (math.log(i + 2.0) / math.log(2.0)) * 1e6)
    }.sum
    val out = graft.operators.RetrievalEval
      .ndcg(spark, Sf0001, query, "en", k).collect()(0)
    assert(out.getAs[Long]("dcg_micro") == fold(grades.toSeq))
    assert(out.getAs[Long]("idcg_micro") >= out.getAs[Long]("dcg_micro"))
    assert(out.getAs[Long]("ndcg_micro") <= 1000000L)
    val firstFull = grades.indexWhere(_ == terms.length)
    val expectMrr =
      if (firstFull < 0) 0L else math.round(1e6 / (firstFull + 1))
    assert(out.getAs[Long]("mrr_micro") == expectMrr)
  }

  test("Tables.invalidate drops the memoized relation; reload re-reads") {
    val a = Tables.documents(spark, Sf0001)
    val b = Tables.documents(spark, Sf0001)
    assert(a eq b) // memoized
    Tables.invalidate(s"$Sf0001/documents.parquet")
    val c = Tables.documents(spark, Sf0001)
    assert(!(a eq c)) // fresh relation after invalidation
    assert(c.count() == a.count())
  }
}
