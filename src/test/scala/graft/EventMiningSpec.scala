package graft

import graft.operators.EventMining

class EventMiningSpec extends SparkSpec {

  test("session table: persisted assignment is row-identical to the " +
      "inline window chain and is probed without a sessionize exchange") {
    val t = EventMining.ensureSessionTable(spark, Sf0001, 1800L)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("event_id", "user_id", "tsec", "event_type", "session_seq")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    val persisted = rows(spark.table(t))
    val inline = rows(EventMining.sessionAssign(spark, Sf0001, 1800L))
    assert(persisted.nonEmpty && persisted == inline)
    // the consumer plan scans the bucketed table; the only shuffle left
    // is the path aggregate (the sessionize exchange is gone — the
    // user_id bucketing satisfies the per-session window)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = EventMining.openingPaths(spark, Sf0001, 1800L, 3, 10)
        .queryExecution.executedPlan
      def all(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] =
        p +: p.children.flatMap(all)
      assert(plan.toString.contains("graft_sess_1800_"))
      assert(all(plan).count(_.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]) == 1)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("events_sessions report reads the persisted session table: no " +
      "window pass, one exchange (r19 verdict #7)") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.operators.Relational
        .eventSessions(spark, Sf0001, 1800L)
      val plan = df.queryExecution.executedPlan
      def all(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] =
        p +: p.children.flatMap(all)
      assert(plan.toString.contains("graft_sess_1800_"),
        "report must scan the persisted assignment")
      assert(!plan.toString.contains("Window"),
        "the inline sessionize window chain survived")
      // the bucketed user_id scan satisfies the (user_id, session_seq)
      // groupBy clustering; the one exchange left is the output sort
      assert(all(plan).count(_.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]) == 1)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("transitions: probs row-normalize to 1 and pairs stay in-session") {
    val rows = EventMining.transitions(spark, Sf0001, 1800L).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (from, rs) =>
      val total = rs.map(_.getAs[Double]("prob")).sum
      assert(math.abs(total - 1.0) < 1e-4, s"$from probs sum to $total")
    }
    // pair count conservation: every non-terminal event emits one pair
    val nPairs = rows.map(_.getAs[Long]("n_pairs")).sum
    val sessions = graft.operators.Relational
      .eventSessions(spark, Sf0001, 1800L).collect()
    val expected = sessions.map(_.getAs[Long]("n_events") - 1).sum
    assert(nPairs == expected,
      s"pairs $nPairs != events-minus-sessions $expected")
  }

  test("basket rules: lift is symmetric in its marginals and bounded") {
    val rows = EventMining.basketRules(spark, Sf0001, 1800L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, c, l) = (r.getAs[Double]("support"),
        r.getAs[Double]("confidence"), r.getAs[Double]("lift"))
      assert(s > 0 && s <= 1.0, s"support $s")
      assert(c >= s - 1e-9 && c <= 1.0, s"confidence $c < support $s")
      assert(l > 0, s"lift $l")
      // confidence = support_pair / support_a >= support_pair
      assert(r.getAs[String]("item_a") < r.getAs[String]("item_b"))
    }
  }

  test("acf: correlations bounded, n shrinks by exactly lag") {
    val rows = EventMining.acfDaily(spark, Sf0001, 7).collect()
    assert(rows.nonEmpty)
    val nDays = rows.filter(_.getAs[Int]("lag") == 1)
      .map(_.getAs[Long]("n")).head + 1
    rows.foreach { r =>
      val acf = r.getAs[Double]("acf")
      assert(acf >= -1.0 - 1e-9 && acf <= 1.0 + 1e-9, s"acf $acf")
      assert(r.getAs[Long]("n") == nDays - r.getAs[Int]("lag"))
    }
  }

  test("dow profile: 7 slots per type, day counts partition the span") {
    val rows = EventMining.dowProfile(spark, Sf0001).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      assert(rs.map(_.getAs[Long]("dow")).sorted.sameElements(0L to 6L),
        s"$t slots")
      rs.foreach { r =>
        assert(r.getAs[Double]("sd_n") >= 0.0)
        assert(r.getAs[Long]("n_outlier_days") <= r.getAs[Long]("n_days"))
      }
    }
    // every type sees the same dense span
    val spans = byType.values.map(_.map(_.getAs[Long]("n_days")).sum).toSet
    assert(spans.size == 1, s"spans $spans")
  }

  test("user growth: cum is monotone and ends at the distinct-user total") {
    val rows = EventMining.userGrowth(spark, Sf0001).collect()
      .sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    val cums = rows.map(_.getAs[Long]("cum_users"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
    assert(cums.last == rows.map(_.getAs[Long]("n_new")).sum)
    val users = spark.read.parquet(s"$Sf0001/events.parquet")
      .select("user_id").distinct().count()
    assert(cums.last == users)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_new") <= r.getAs[Long]("n_active")))
  }

  test("time-to-convert: deltas positive, quantiles ordered") {
    val r = EventMining.timeToConvert(spark, Sf0001).collect().head
    assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_viewers"))
    assert(r.getAs[Long]("min_sec") > 0L)
    val (p50, p90) = (r.getAs[Double]("p50_sec"), r.getAs[Double]("p90_sec"))
    assert(r.getAs[Long]("min_sec") <= p50 && p50 <= p90)
    assert(p90 <= r.getAs[Long]("max_sec"))
  }

  test("ewma matches the sequential adjust=False recurrence exactly") {
    val rows = EventMining.ewmaDaily(spark, Sf0001, 0.3).collect()
      .groupBy(_.getAs[String]("event_type"))
    assert(rows.nonEmpty)
    rows.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("day"))
      // dense axis: days are consecutive
      val days = sorted.map(_.getAs[Long]("day"))
      assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 })
      var s = sorted.head.getAs[Long]("n_events").toDouble
      sorted.zipWithIndex.foreach { case (r, i) =>
        if (i > 0) s = 0.7 * s + 0.3 * r.getAs[Long]("n_events")
        val got = r.getAs[Double]("ewma")
        assert(math.abs(got - s) < 1e-5, s"day ${r.get(1)}: $got vs $s")
      }
    }
  }
}
