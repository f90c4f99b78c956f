package graft

import org.apache.spark.sql.functions._

import graft.operators.{QualityLm, Relational, Sampling, Sketches}

/** Semantics of the late-round-7 additions: TPC-H q7/q10/q18 shapes,
  * the event-value histogram, the unigram-LM quality score, and the
  * training-mixture weights. */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- driver contract hygiene ------------------------------------------

  test("every oracle key names a registered query (stray oracles never gate)") {
    val stray = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stray.isEmpty, s"oracles without queries: $stray")
    // and the rows-only set stays the documented three
    // (quality_compress went oracled in r13 via the LZ-novelty form)
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("emb_tfidf_ann",
      "s9_relation_size", "emb_client"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  // ---- TPC-H shapes -----------------------------------------------------

  test("q7: only the two nation pairs appear, revenue recomputes") {
    // sf0.001 may legitimately have zero NATION_1<->NATION_2 trade; the
    // test asserts agreement with an independent join, not non-emptiness
    // (the sf0.01/sf0.1 oracle gate covers the non-empty case)
    val rows = Relational.q7VolumeShipping(spark, Sf0001).collect()
    val pairs = rows.map(r => (r.getAs[String]("supp_nation"),
      r.getAs[String]("cust_nation"))).toSet
    assert(pairs.subsetOf(Set(("NATION_1", "NATION_2"),
      ("NATION_2", "NATION_1"))))
    rows.foreach { r =>
      assert(r.getAs[Double]("revenue") > 0)
      assert(r.getAs[Long]("n_items") > 0)
      val y = r.getAs[Long]("l_year")
      assert(y >= 1995L && y <= 2001L)
    }
    // total line count cross-checks an independent join formulation
    val expected = Tables.lineitem(spark, Sf0001).as("l")
      .join(Tables.orders(spark, Sf0001).as("o"),
        $"l.l_orderkey" === $"o.o_orderkey")
      .join(Tables.supplier(spark, Sf0001).as("s"),
        $"l.l_suppkey" === $"s.s_suppkey")
      .join(Tables.customer(spark, Sf0001).as("c"),
        $"o.o_custkey" === $"c.c_custkey")
      .join(Tables.nation(spark, Sf0001).as("sn"),
        $"s.s_nationkey" === $"sn.n_nationkey")
      .join(Tables.nation(spark, Sf0001).as("cn"),
        $"c.c_nationkey" === $"cn.n_nationkey")
      .filter(($"sn.n_name" === "NATION_1" && $"cn.n_name" === "NATION_2") ||
        ($"sn.n_name" === "NATION_2" && $"cn.n_name" === "NATION_1"))
      .count()
    assert(rows.map(_.getAs[Long]("n_items")).sum == expected)
  }

  test("q10: top-20 by revenue desc, only R-flag lines in the window") {
    val rows = Relational.q10ReturnedItems(spark, Sf0001).collect()
    assert(rows.length <= 20)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
    // every reported customer really has an R-returned line in the window
    val reported = rows.map(_.getAs[Long]("c_custkey")).toSet
    val truth = Tables.lineitem(spark, Sf0001)
      .filter($"l_returnflag" === "R").as("l")
      .join(Tables.orders(spark, Sf0001)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1996-04-01").cast("timestamp")).as("o"),
        $"l.l_orderkey" === $"o.o_orderkey")
      .select($"o.o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(reported.subsetOf(truth))
  }

  test("q18: every order exceeds the quantity threshold; ordering holds") {
    val rows = Relational.q18LargeOrders(spark, Sf0001, 150.0).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("sum_qty") > 150.0))
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
    // grain is order-level: no duplicate orderkeys
    val keys = rows.map(_.getAs[Long]("o_orderkey"))
    assert(keys.distinct.length == keys.length)
    // spot-check one order's quantity sum against a direct recompute
    val k = keys.head
    val direct = Tables.lineitem(spark, Sf0001)
      .filter($"l_orderkey" === k)
      .agg(round(sum($"l_quantity"), 2)).head().getDouble(0)
    assert(rows.head.getAs[Double]("sum_qty") == direct)
  }

  test("q8/q13/percentiles: shares bounded, distributions conserve") {
    val q8 = Relational.q8MarketShare(spark, Sf0001).collect()
    assert(q8.nonEmpty)
    q8.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0)
    }
    val q13 = Relational.q13CustomerDistribution(spark, Sf0001).collect()
    assert(q13.map(_.getAs[Long]("custdist")).sum ==
      Tables.customer(spark, Sf0001).count())
    val wp = Relational.segmentPercentiles(spark, Sf0001).collect()
    wp.foreach { r =>
      val p = r.getAs[Double]("pct_rank")
      assert(p >= 0.0 && p <= 1.0)
      if (r.getAs[Long]("rn") == 1L) assert(p == 0.0)
      assert(r.getAs[Double]("cume") > 0.0)
    }
  }

  test("q15/q17/q22: decorrelated shapes agree with direct recomputes") {
    // q15: winners carry the max of the independent per-supplier agg
    val rev = Tables.lineitem(spark, Sf0001)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
        .as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val q15 = Relational.q15TopSupplier(spark, Sf0001).collect()
    assert(q15.nonEmpty)
    val mx = rev.values.max
    q15.foreach(r =>
      assert(math.abs(r.getAs[Double]("total_rev") - mx) < 1e-6))
    // q17: every qualifying line is strictly under 20% of its part avg
    val q17 = Relational.q17SmallQtyRevenue(spark, Sf0001).head()
    val li = Tables.lineitem(spark, Sf0001).as("l")
      .join(Tables.part(spark, Sf0001)
        .filter($"p_brand" === "Brand#1").select("p_partkey"),
        $"l_partkey" === $"p_partkey")
      .select("l_partkey", "l_quantity").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val avgByPart = li.groupBy(_._1).view
      .mapValues(v => v.map(_._2).sum / v.length).toMap
    val expected17 = li.count { case (p, q) => q < 0.2 * avgByPart(p) }
    assert(q17.getAs[Long]("n_lines") == expected17.toLong)
    // q22: customer counts conserve against a driver-side recompute
    val q22 = Relational.q22Prospects(spark, Sf0001).collect()
    val cust = Tables.customer(spark, Sf0001)
      .select("c_custkey", "c_acctbal", "c_mktsegment").collect()
    val pos = cust.filter(_.getDouble(1) > 0)
    val avgBal = pos.map(_.getDouble(1)).sum / pos.length
    val recent = Tables.orders(spark, Sf0001)
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val expected22 = cust.count(r =>
      r.getDouble(1) > avgBal && !recent(r.getLong(0)))
    assert(q22.map(_.getAs[Long]("n_customers")).sum == expected22.toLong)
  }

  // ---- plan shapes ------------------------------------------------------

  test("q7: nation-filtered dims broadcast; no nested-loop from the OR") {
    val plan = Relational.q7VolumeShipping(spark, Sf0001)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // the nation pre-filter is pushed into the dim scans, not evaluated
    // post-join (pushed as In or as two EqualTo arms)
    assert(plan.contains("In(n_name") || plan.contains("EqualTo(n_name"))
  }

  test("q10: returnflag filter pushed to scan; customer/nation broadcast") {
    val plan = Relational.q10ReturnedItems(spark, Sf0001)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("EqualTo(l_returnflag,R)"))
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q18: lineitem aggregates to order grain BEFORE the orders join") {
    val plan = Relational.q18LargeOrders(spark, Sf0001, 150.0)
      .queryExecution.executedPlan.toString()
    // partial + final aggregate pair on l_orderkey feeding the join
    assert(plan.contains("HashAggregate"))
    val aggIdx = plan.indexOf("HashAggregate")
    val joinIdx = math.max(plan.indexOf("SortMergeJoin"),
      plan.indexOf("BroadcastHashJoin"))
    assert(aggIdx >= 0 && joinIdx >= 0)
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("histogram/unigram: single-shuffle aggregates, no extra exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def nodes(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children.flatMap(nodes) ++
        (p match { case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
                   case _ => Seq.empty }))
    val hist = Sketches.valueHistogram(spark, Sf0001, 0.0, 50.0, 10)
    val shuffles = nodes(hist.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeExec])
    // one partial-agg shuffle on (type, bucket) + the output sort's
    // range exchange — nothing else
    assert(shuffles <= 2, s"histogram plan has $shuffles exchanges")
  }

  // ---- histogram --------------------------------------------------------

  test("histogram: bucket counts partition each type's events exactly") {
    val rows = Sketches.valueHistogram(spark, Sf0001, 0.0, 50.0, 10)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(b >= 0 && b <= 9)
    }
    val perType = rows.groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    val truth = Tables.events(spark, Sf0001).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perType == truth)
    // one bucket's count against a direct range filter (bucket 2 of view)
    val n2 = rows.find(r => r.getAs[String]("event_type") == "view" &&
      r.getAs[Int]("bucket") == 2).map(_.getAs[Long]("n")).getOrElse(0L)
    val direct = Tables.events(spark, Sf0001)
      .filter($"event_type" === "view" &&
        $"value" >= 100.0 && $"value" < 150.0).count()
    assert(n2 == direct)
  }

  // ---- unigram LM quality ----------------------------------------------

  test("unigram nll: one row per tokenized doc, recomputes driver-side") {
    val rows = QualityLm.unigramNll(spark, Sf0001).collect()
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> functions.TextAnalyzer.analyze(r.getString(1)))
      .filter(_._2.nonEmpty)
    assert(rows.length == docs.length)
    // full corpus unigram model, driver-side
    val ctf = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong)
    val total = ctf.values.sum.toDouble
    val byId = docs.toMap
    rows.take(20).foreach { r =>
      val toks = byId(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tokens") == toks.length.toLong)
      val s = toks.groupBy(identity).map { case (t, g) =>
        g.size.toDouble * math.log(ctf(t).toDouble)
      }.sum
      val nll = math.log(total) - s / toks.length
      assert(math.abs(r.getAs[Double]("nll") - nll) < 1e-5)
      assert(r.getAs[Double]("nll") > 0) // rarer than uniform-1 impossible
    }
    // sorted worst-first
    val nlls = rows.map(_.getAs[Double]("nll"))
    assert(nlls.sameElements(nlls.sortBy(-_)))
  }

  // ---- prefix search / json range / outliers ----------------------------

  test("prefix search, json range, outliers recompute driver-side") {
    // prefix: top doc's matched_tf equals a direct token count
    val hits = graft.operators.Fts.prefixSearch(spark, Sf0001, "ha", 5)
      .collect()
    assert(hits.nonEmpty)
    val top = hits.head
    val text = Tables.documents(spark, Sf0001)
      .filter($"doc_id" === top.getAs[Long]("doc_id"))
      .select("text").head().getString(0)
    val toks = functions.TextAnalyzer.analyze(text)
    assert(toks.count(_.startsWith("ha")).toLong ==
      top.getAs[Long]("matched_tf"))
    // json range: conservation against a driver-side parse
    val rows = graft.operators.TextOps
      .metadataRangeFilter(spark, Sf0001, "k", 25L, 75L).collect()
    val expected = Tables.events(spark, Sf0001)
      .select("event_type", "props").collect()
      .map(r => r.getString(0) ->
        """\d+""".r.findFirstIn(r.getString(1)).get.toLong)
      .filter { case (_, k) => k >= 25 && k < 75 }
    assert(rows.map(_.getAs[Long]("n")).sum == expected.length.toLong)
    // outliers: all above their type mean, sorted by zscore
    val out = graft.operators.Sketches.valueOutliers(spark, Sf0001, 3.0)
      .collect()
    assert(out.nonEmpty)
    val means = Tables.events(spark, Sf0001).groupBy("event_type")
      .agg(avg($"value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.foreach(r => assert(r.getAs[Double]("value") >
      means(r.getAs[String]("event_type"))))
    val zs = out.map(_.getAs[Double]("zscore"))
    assert(zs.sameElements(zs.sortBy(-_)))
    assert(zs.forall(_ > 3.0))
  }

  // ---- funnel & retention -----------------------------------------------

  test("funnel: stages shrink monotonically, stage 2 recomputes") {
    val rows = Relational.eventsFunnel(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    assert(rows("1_view") >= rows("2_click_after_view"))
    assert(rows("2_click_after_view") >= rows("3_purchase_after_click"))
    // driver-side recompute of click-after-first-view
    val evTbl = Tables.events(spark, Sf0001)
    val ev = evTbl
      .select(col("user_id"), Tables.tsSeconds(evTbl).as("tsec"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val firstView = ev.filter(_._3 == "view").groupBy(_._1)
      .view.mapValues(_.map(_._2).min).toMap
    val stage2 = ev.filter { case (u, t, ty) =>
      ty == "click" && firstView.get(u).exists(t > _)
    }.map(_._1).distinct.length
    assert(rows("2_click_after_view") == stage2.toLong)
  }

  test("retention: offset-0 equals cohort size, users conserve") {
    val rows = Relational.eventsRetention(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val offset0 = rows.filter(_.getAs[Long]("offset_wk") == 0L)
      .map(_.getAs[Long]("n_users")).sum
    val totalUsers = Tables.events(spark, Sf0001)
      .select("user_id").distinct().count()
    // every user appears in their own cohort's week-0 cell exactly once
    assert(offset0 == totalUsers)
    rows.foreach(r => assert(r.getAs[Long]("offset_wk") >= 0L))
  }

  // ---- keyset pagination / weighted sample / incremental dedup ----------

  test("keyset pagination: exactly the ordered slice after the cursor") {
    val rows = Relational.paginateKeyset(spark, Sf0001, 10L, 7)
      .collect().map(_.getAs[Long]("doc_id"))
    val all = Tables.documents(spark, Sf0001)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == all.filter(_ > 10L).take(7).toSeq)
  }

  test("weighted sample: sqrt damping up-samples small strata") {
    val sizes = Tables.documents(spark, Sf0001)
      .groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val rows = graft.operators.Sampling.weightedSample(spark, Sf0001, 0.2)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = (r.getAs[String]("source"), r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_sampled") <= sizes(key))
      val rate = r.getAs[Double]("rate")
      assert(rate > 0.0 && rate <= 1.0)
    }
    // reruns are row-identical (hash threshold, no RNG)
    val again = graft.operators.Sampling.weightedSample(spark, Sf0001, 0.2)
      .collect().map(_.toString).toSeq
    assert(rows.map(_.toString).toSeq == again)
  }

  test("incremental dedup: exactly the cross-batch slice of the pairs") {
    val full = graft.operators.Dedup.minhashPairs(spark, Sf0001, 0.4)
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val expected = full.collect {
      case (a, b) if (a % 10 == 7) != (b % 10 == 7) =>
        if (a % 10 == 7) (a, b) else (b, a)
    }.toSet
    val inc = graft.operators.Dedup.minhashIncremental(spark, Sf0001, 0.4)
      .collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("corpus_id")))
      .toSet
    assert(inc == expected)
  }

  // ---- digests & skew ---------------------------------------------------

  test("table digest: invariant under repartition, changes on content") {
    import graft.operators.ScaleOps
    val base = ScaleOps.tableDigests(spark, Sf0001)
      .collect().map(_.toString).toSeq
    // same rows through a different partitioning/order produce the
    // same digest (the whole point of commutative folds)
    val dir2 = java.nio.file.Files.createTempDirectory("digest").toString
    Seq("documents", "events", "orders").foreach { t =>
      Tables.load(spark, Sf0001, t)
        .repartition(7).sortWithinPartitions(rand(42))
        .write.mode("overwrite").parquet(s"$dir2/$t.parquet")
    }
    val shuffled = ScaleOps.tableDigests(spark, dir2)
      .collect().map(_.toString).toSeq
    assert(base == shuffled)
    // flipping one row's content changes the digest
    val dir3 = java.nio.file.Files.createTempDirectory("digest3").toString
    Tables.documents(spark, Sf0001)
      .withColumn("text",
        when($"doc_id" === 0L, lit("tampered")).otherwise($"text"))
      .write.mode("overwrite").parquet(s"$dir3/documents.parquet")
    Seq("events", "orders").foreach { t =>
      Tables.load(spark, Sf0001, t)
        .write.mode("overwrite").parquet(s"$dir3/$t.parquet")
    }
    val tampered = ScaleOps.tableDigests(spark, dir3)
      .collect().map(_.toString).toSeq
    assert(base != tampered)
    assert(base.filterNot(_.contains("documents")) ==
      tampered.filterNot(_.contains("documents")))
  }

  test("table digest: null-shift between adjacent columns is detected") {
    import graft.operators.ScaleOps
    // (lang=NULL, source="x") vs (lang="x", source=NULL) must hash
    // differently — the concat_ws-skips-nulls bug made them identical
    val dirA = java.nio.file.Files.createTempDirectory("nullA").toString
    val dirB = java.nio.file.Files.createTempDirectory("nullB").toString
    val base = Seq((1L, "t", null.asInstanceOf[String], "x", 1L),
      (2L, "u", "en", "y", 1L))
    val shifted = Seq((1L, "t", "x", null.asInstanceOf[String], 1L),
      (2L, "u", "en", "y", 1L))
    Seq((dirA, base), (dirB, shifted)).foreach { case (dir, rows) =>
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      Seq("events", "orders").foreach { t =>
        Tables.load(spark, Sf0001, t)
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
    }
    def docDigest(dir: String) = ScaleOps.tableDigests(spark, dir)
      .filter($"table_name" === "documents").head().toString
    assert(docDigest(dirA) != docDigest(dirB))
  }

  test("packing: bins are contiguous, budgets respected before overflow") {
    val budget = 500L
    val rows = graft.operators.TextOps.packSequences(spark, Sf0001, budget)
      .collect()
    assert(rows.length > 1)
    // bins are consecutive from 0
    assert(rows.map(_.getAs[Long]("bin")).toSeq ==
      (0L until rows.length.toLong))
    // every bin except possibly the last holds >= budget tokens only
    // via its final straddling doc: tokens-before-last-doc < budget
    // => n_tokens < budget + max doc size; and total conserves
    val totalToks = Tables.documents(spark, Sf0001)
      .select(org.apache.spark.sql.functions.size(
        functions.TextAnalyzer.tokens($"text")).cast("long"))
      .collect().map(_.getLong(0)).sum
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalToks)
    // every non-last bin's cumulative end crosses its budget boundary
    // (a single bin's fill may be < 1 when the previous bin's
    // straddling doc consumed the start of its range)
    val cumEnds = rows.map(_.getAs[Long]("n_tokens")).scanLeft(0L)(_ + _)
      .drop(1)
    cumEnds.init.zipWithIndex.foreach { case (end, k) =>
      assert(end >= (k + 1) * budget, s"bin $k ends at $end")
    }
  }

  test("two-pass prefix sum matches the single-reducer window exactly") {
    import graft.operators.ScaleOps
    val toks = Tables.documents(spark, Sf0001)
      .select($"doc_id",
        org.apache.spark.sql.functions.size(
          functions.TextAnalyzer.tokens($"text")).cast("long").as("toks"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"doc_id".asc)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val global = toks
      .withColumn("cum_before", coalesce(sum($"toks").over(w), lit(0L)))
      .select("doc_id", "cum_before").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twoPass = ScaleOps.prefixSummed(toks, "doc_id", "toks", 5)
      .select("doc_id", "cum_before").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoPass == global)
    // and the scale path really distributes: rows occupy >1 physical
    // partition AFTER the bucket window. AQE would coalesce the tiny
    // fixture shuffle, and selecting only spark_partition_id() lets
    // column pruning delete the window+exchange entirely — so keep
    // cum_before in the projection and distinct on the driver
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val nPids = ScaleOps.prefixSummed(toks, "doc_id", "toks", 5)
        .select(org.apache.spark.sql.functions
          .spark_partition_id().as("p"), col("cum_before"))
        .collect().map(_.getInt(0)).distinct.length
      assert(nPids > 1)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("skew stats: relative frequencies recompute, skew is the max") {
    val rows = graft.operators.ScaleOps.joinKeySkew(spark, Sf0001, 10)
      .collect()
    assert(rows.length == 10)
    val counts = Tables.orders(spark, Sf0001)
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val av = counts.values.sum.toDouble / counts.size
    val mx = counts.values.max
    // top row really is the global max key count
    assert(rows.head.getAs[Long]("n_orders") == mx)
    rows.foreach { r =>
      assert(counts(r.getAs[Long]("o_custkey")) ==
        r.getAs[Long]("n_orders"))
      assert(math.abs(r.getAs[Double]("skew_factor") -
        math.rint(mx / av * 1e4) / 1e4) < 1e-9)
    }
  }

  // ---- bloom semi-join reduction ----------------------------------------

  test("bloom join: prunes the fact scan, loses no true match") {
    import graft.operators.ScaleOps
    val cust = Tables.customer(spark, Sf0001)
      .filter($"c_mktsegment" === "BUILDING").select("c_custkey")
    val words = ScaleOps.buildJoinBloom(cust, "c_custkey")
    val orders = Tables.orders(spark, Sf0001)
    val kept = orders
      .filter(ScaleOps.joinBloomMightContain(words.toSeq, $"o_custkey"))
    val custKeys = cust.collect().map(_.getLong(0)).toSet
    val trueMatches = orders.collect()
      .count(r => custKeys(r.getAs[Long]("o_custkey")))
    val keptN = kept.count()
    // no false negatives: every true match survives the bloom
    assert(keptN >= trueMatches)
    // and the filter genuinely prunes (false positives stay rare at
    // 4096 bits / 5 hashes for a few hundred keys)
    assert(keptN < orders.count())
    // end to end: bloomed result == plain-join result
    val bloomed = ScaleOps.bloomPrunedRevenue(spark, Sf0001)
      .collect().map(_.toString).toSeq
    val plain = orders
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice".cast("decimal(18,6)")), 2)
          .cast("double").as("total_price"))
      .orderBy($"o_orderpriority".asc)
      .collect().map(_.toString).toSeq
    assert(bloomed == plain)
  }

  test("bloom join: cross-width keys (INT build, BIGINT probe) lose " +
      "no true match") {
    import graft.operators.ScaleOps
    // build on INT-typed keys, probe BIGINT-typed ones: xxhash64 is
    // type-sensitive, so without the BIGINT canonicalization inside
    // jbloomIdx this pairing silently DROPPED matching rows
    val cust = Tables.customer(spark, Sf0001)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey".cast("int").as("c_custkey"))
    val words = ScaleOps.buildJoinBloom(cust, "c_custkey")
    val orders = Tables.orders(spark, Sf0001) // o_custkey is BIGINT
    val custKeys = cust.collect().map(_.getInt(0).toLong).toSet
    val trueMatches = orders.collect()
      .count(r => custKeys(r.getAs[Long]("o_custkey")))
    val keptTrue = orders
      .filter(ScaleOps.joinBloomMightContain(words.toSeq, $"o_custkey"))
      .collect().count(r => custKeys(r.getAs[Long]("o_custkey")))
    assert(keptTrue == trueMatches) // zero false negatives across widths
  }

  test("rolling window: frame counts clamp at the frame size") {
    val rows = Relational.rollingUserStats(spark, Sf0001, 10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("roll_n")
      assert(n >= 1 && n <= 10)
      assert(r.getAs[Double]("roll_max") >= r.getAs[Double]("roll_avg"))
    }
    // a user's first event has frame size 1 and avg == its own value
    val first = rows.groupBy(_.getAs[Long]("user_id"))
      .values.map(_.head)
    first.foreach { r =>
      assert(r.getAs[Long]("roll_n") == 1L)
      assert(math.abs(r.getAs[Double]("roll_avg") -
        math.rint(r.getAs[Double]("value") * 1e6) / 1e6) < 1e-6)
    }
  }

  test("ntile: decile sizes differ by at most one, ranges nest") {
    val rows = Relational.customerDeciles(spark, Sf0001).collect()
    assert(rows.length == 10)
    val sizes = rows.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1)
    assert(sizes.sum == Tables.customer(spark, Sf0001).count())
    // deciles ordered by descending balance: min of decile d >= max of d+1
    rows.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi.getAs[Double]("min_bal") >= lo.getAs[Double]("max_bal"))
    }
  }

  // ---- duplicated spans -------------------------------------------------

  test("dedup spans: cross-doc verbatim 5-gram runs, counts recompute") {
    val rows = operators.Dedup.duplicatedSpans(spark, Sf0001, 50).collect()
    assert(rows.nonEmpty) // fixture has exact-duplicate docs
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 1)
      assert(r.getAs[Long]("n_occurrences") >= r.getAs[Long]("n_docs"))
      assert(r.getAs[String]("gram").split(" ").length ==
        operators.Dedup.SpanGramSize)
    }
    // driver-side recompute of the top gram's counts
    val gram = rows.head.getAs[String]("gram")
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> functions.TextAnalyzer.analyze(r.getString(1)))
    val occ = docs.map { case (_, toks) =>
      toks.sliding(operators.Dedup.SpanGramSize)
        .count(_.mkString(" ") == gram)
    }
    assert(occ.sum.toLong == rows.head.getAs[Long]("n_occurrences"))
    assert(occ.count(_ > 0).toLong == rows.head.getAs[Long]("n_docs"))
  }

  // ---- Gopher quality gate ----------------------------------------------

  test("gopher gate: pass is the conjunction; signals recompute") {
    val rows = operators.TextOps.gopherQuality(spark, Sf0001).collect()
    assert(rows.length == Tables.documents(spark, Sf0001).count())
    val outcomes = rows.map(_.getAs[Boolean]("pass")).toSet
    assert(outcomes == Set(true, false)) // thresholds discriminate
    rows.foreach { r =>
      val conj = r.getAs[Boolean]("r_length") &&
        r.getAs[Boolean]("r_meanlen") && r.getAs[Boolean]("r_symbol") &&
        r.getAs[Boolean]("r_stopword") && r.getAs[Boolean]("r_repeat")
      assert(r.getAs[Boolean]("pass") == conj)
    }
    // spot recompute of the scalar signals on one document
    val doc = Tables.documents(spark, Sf0001)
      .orderBy($"doc_id".asc).select("doc_id", "text").head()
    val text = doc.getString(1)
    val words = text.trim.split("\\s+")
    val row = rows.find(_.getAs[Long]("doc_id") == doc.getLong(0)).get
    assert(row.getAs[Long]("word_count") == words.length.toLong)
    val meanWl = text.replaceAll("\\s", "").length.toDouble / words.length
    assert(math.abs(row.getAs[Double]("mean_word_len") -
      math.rint(meanWl * 1e4) / 1e4) < 1e-9)
  }

  // ---- curation report --------------------------------------------------

  test("curation report: rates bounded, doc counts conserve") {
    val rows = graft.operators.QualityLm.curationReport(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pr = r.getAs[Double]("pass_rate")
      assert(pr >= 0.0 && pr <= 1.0)
      assert(r.getAs[Double]("mean_nll") > 0.0)
    }
    // inner-join grain: docs with tokens (all fixture docs tokenize)
    val tokenized = Tables.documents(spark, Sf0001)
      .select("text").collect()
      .count(r => functions.TextAnalyzer.analyze(r.getString(0)).nonEmpty)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == tokenized.toLong)
  }

  // ---- mixture weights --------------------------------------------------

  test("mix weights: shares and weights each sum to 1, docs conserve") {
    val rows = Sampling.mixWeights(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val shareSum = rows.map(_.getAs[Double]("token_share")).sum
    val weightSum = rows.map(_.getAs[Double]("mix_weight")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3)
    assert(math.abs(weightSum - 1.0) < 1e-3)
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, Sf0001).count())
    // sqrt damping: a stratum's weight exceeds its raw share iff the
    // stratum is smaller than average (up-sampling small sources)
    val nGroups = rows.length
    rows.foreach { r =>
      val (share, w) = (r.getAs[Double]("token_share"),
        r.getAs[Double]("mix_weight"))
      if (share * nGroups < 0.5) assert(w > share)
    }
  }
}
