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
