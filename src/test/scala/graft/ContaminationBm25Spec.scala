package graft

import org.apache.spark.sql.functions._

import graft.operators.{Contamination, Fts, Relational}

/** Semantics of the round-7 additions: BM25 ranking, the benchmark-
  * contamination screen, and the TPC-H-shaped relational queries. */
class ContaminationBm25Spec extends SparkSpec {
  import spark.implicits._

  // ---- BM25 -------------------------------------------------------------

  test("bm25: OR-match is a superset of AND-match on the same query") {
    val orHits = Fts.searchBm25(spark, Sf0001, "hash join merge", "en", 1000)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val andHits = Fts.search(spark, Sf0001, "hash join merge", "en", 1000)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(andHits.subsetOf(orHits))
    assert(orHits.size > andHits.size) // fixture has partial-match docs
  }

  test("bm25: engine score matches a driver-side recompute of the formula") {
    val (k1, b) = (1.2, 0.75)
    val docs = graft.Tables.documents(spark, Sf0001)
      .filter($"lang" === "en").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val terms = graft.functions.TextAnalyzer.analyze("hash join merge").distinct
    val toks = docs.map { case (id, t) =>
      id -> graft.functions.TextAnalyzer.analyze(t)
    }.toMap
    val n = docs.length.toLong
    val avgdl = toks.values.map(_.length.toLong).sum.toDouble / n
    val dfs = terms.map(t => toks.values.count(_.contains(t)).toLong)
    def score(id: Long): Double = {
      val tl = toks(id)
      val dl = tl.length
      val s = terms.zip(dfs).map { case (t, df) =>
        val tf = tl.count(_ == t)
        if (tf == 0) 0.0
        else math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
          (tf * (k1 + 1.0)) /
          (tf + k1 * (1.0 - b + b * dl / avgdl))
      }.sum
      math.rint(s * 1e6) / 1e6
    }
    val top = Fts.searchBm25(spark, Sf0001, "hash join merge", "en", 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
    top.foreach { case (id, sc) => assert(math.abs(sc - score(id)) < 1e-9) }
    // and the reported ranking really is the global maximum
    val best = docs.map(d => score(d._1)).max
    assert(math.abs(top.head._2 - best) < 1e-9)
  }

  // ---- Contamination screen ---------------------------------------------

  test("contamination: shared n-grams are found, clean docs are not flagged") {
    val corpus = Seq(
      (0L, "en", "alpha beta gamma delta epsilon"), // benchmark (id % 97 == 0)
      (1L, "en", "prefix words then alpha beta gamma delta afterwards"),
      (2L, "en", "completely unrelated content with different tokens")
    ).toDF("doc_id", "lang", "text")
    val grams = Contamination.docGrams(corpus).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[String]]("grams").toSet).toMap
    // doc1 shares exactly the grams of the common 4-token run:
    // "alpha beta gamma", "beta gamma delta"
    val shared = grams(0L).intersect(grams(1L))
    assert(shared == Set("alpha beta gamma", "beta gamma delta"))
    assert(grams(0L).intersect(grams(2L)).isEmpty)
  }

  test("contamination: fixture screen flags only non-benchmark docs, " +
      "fractions in (0, 1]") {
    val rows = Contamination.screen(spark, Sf0001, 97L).collect()
    assert(rows.nonEmpty) // the fixture corpus has near-dup structure
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 97L != 0L)
      val frac = r.getAs[Double]("contamination")
      assert(frac > 0.0 && frac <= 1.0)
      assert(r.getAs[Long]("shared_grams") <= r.getAs[Long]("n_grams"))
    }
    // worst-first ordering
    val sh = rows.map(_.getAs[Long]("shared_grams"))
    assert(sh.sameElements(sh.sortBy(-(_: Long))))
  }

  // ---- TF-IDF keywords ----------------------------------------------------

  test("keywords: per-doc top-k ranked by tfidf, corpus-wide terms rank low") {
    val rows = Fts.keywordsTfidf(spark, Sf0001, 3).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { rs =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Long]("rank")).sorted.sameElements(
        (1L to rs.length)))
      // ranked desc by tfidf within the doc
      val sc = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("tfidf"))
      assert(sc.sameElements(sc.sortBy(-(_: Double))))
    }
    // a term present in EVERY doc has idf = ln(1) = 0 and can never be
    // a top keyword unless nothing else exists; all reported tfidf > 0
    // on this fixture
    assert(rows.forall(_.getAs[Double]("tfidf") >= 0.0))
  }

  // ---- Relational additions ---------------------------------------------

  test("q6: the range predicates reach the parquet scan as pushed filters") {
    val df = Relational.q6ForecastRevenue(spark, Sf0001)
    val scan = df.queryExecution.executedPlan.toString()
    assert(scan.contains("PushedFilters"))
    // at least the discount bounds must be pushed (shipdate/quantity too)
    assert(scan.contains("GreaterThanOrEqual(l_discount")
      || scan.contains("IsNotNull(l_discount"))
    val row = df.collect().head
    assert(row.getAs[Long]("n_items") > 0L)
    assert(row.getAs[Double]("revenue") > 0.0)
  }

  test("q19: disjunctive predicate keeps a broadcast hash join") {
    val df = Relational.q19DisjunctiveRevenue(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("grouping sets: one Expand pass; levels consistent with gid") {
    val df = Relational.groupingSetsSummary(spark, Sf0001)
    assert(df.queryExecution.executedPlan.toString().contains("Expand"))
    val rows = df.collect()
    // gid 0 = (status, priority), 1 = (status), 3 = grand total
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(0L, 1L, 3L))
    assert(byGid(3L).length == 1)
    val total = byGid(3L).head.getAs[Long]("n")
    assert(byGid(1L).map(_.getAs[Long]("n")).sum == total)
    assert(byGid(0L).map(_.getAs[Long]("n")).sum == total)
  }

  test("q14: promo share is a percentage in [0, 100]") {
    val row = Relational.q14PromoRevenue(spark, Sf0001).collect().head
    val share = row.getAs[Double]("promo_share")
    assert(share >= 0.0 && share <= 100.0)
  }

  test("sliding windows: every event lands in exactly two hops") {
    val total = Relational.eventsSliding(spark, Sf0001)
      .agg(sum("n")).collect().head.getLong(0)
    val events = graft.Tables.events(spark, Sf0001).count()
    assert(total == 2 * events)
  }

  test("pivot: per-status row sums equal the plain groupBy counts") {
    val rows = Relational.pivotSummary(spark, Sf0001).collect()
    val plain = graft.Tables.orders(spark, Sf0001)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val s = Seq("p1_urgent", "p2_high", "p3_medium", "p4_none", "p5_low")
        .map(c => r.getAs[Long](c)).sum
      assert(s == plain(r.getAs[String]("o_orderstatus")))
    }
  }

  test("edit distance: confirms a subset of the Jaccard-verified pairs") {
    val confirmed = graft.operators.Dedup
      .editDistancePairs(spark, Sf0001, 0.5, 240, 60).collect()
    val candidates = graft.operators.Dedup
      .minhashPairs(spark, Sf0001, 0.5).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(confirmed.nonEmpty)
    confirmed.foreach { r =>
      assert(candidates.contains(
        (r.getAs[Long]("a"), r.getAs[Long]("b"))))
      assert(r.getAs[Long]("editdist") >= 0L)
    }
  }

  test("release_manifest: buckets partition the curated set exactly, " +
      "and no released doc shares a gram with the benchmark slice") {
    import org.apache.spark.sql.functions.col
    val (t, mod) = (0.5, 97L)
    val man = graft.operators.Contamination
      .releaseManifest(spark, Sf0001, t, mod).collect()
    // reconciliation per source: curated = eval + contaminated + released
    man.foreach { r =>
      assert(r.getAs[Long]("n_curated") ==
        r.getAs[Long]("n_eval_slice") +
          r.getAs[Long]("n_contaminated") + r.getAs[Long]("n_released"),
        r.toString)
    }
    // curated totals equal curation_apply's survivor count
    val nCurated = graft.operators.Dedup
      .curationApply(spark, Sf0001, t).count()
    assert(man.map(_.getAs[Long]("n_curated")).sum == nCurated)
    // strictness: recompute the contaminated doc set independently via
    // the screen — a released doc must never appear in it, and the
    // eval slice never releases
    val screenHits = graft.operators.Contamination
      .screen(spark, Sf0001, mod)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val curatedDocs = graft.operators.Dedup
      .curationApply(spark, Sf0001, t)
      .select("doc_id").collect().map(_.getLong(0))
    val releasedCount = curatedDocs.count(d =>
      d % mod != 0 && !screenHits.contains(d))
    assert(man.map(_.getAs[Long]("n_released")).sum == releasedCount)
    graft.operators.CacheScope.release(spark)
  }
}
