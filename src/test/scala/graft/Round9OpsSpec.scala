package graft

import org.apache.spark.sql.functions._

/** Round-9 operator specs. */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  test("cdc_timestamps reproduces the reference trigger's stamp " +
      "semantics (created_at fixed, updated_at bumped on update)") {
    val rows = operators.Cdc.mergeTimestamps(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, (version, created, updated)) =>
      assert(updated >= created, s"doc $id updated_at < created_at")
      if (id >= 1000000L) {
        // fresh insert: both stamps are the batch time
        assert(created == operators.Cdc.BatchTs && updated == created)
      } else if (id % 10 == 0) {
        // updated in the batch: created_at untouched, updated_at bumped
        assert(version == 2L && created == operators.Cdc.BaseTs &&
          updated == operators.Cdc.BatchTs)
      } else {
        // untouched: updated_at still equals created_at (base load)
        assert(version == 1L && created == operators.Cdc.BaseTs &&
          updated == operators.Cdc.BaseTs)
      }
    }
    // deletes still apply last: no deleted id survives
    assert(!rows.keys.exists(id => id < 1000000L && id % 17 == 0))
    // and the stamp pass didn't change the survivor set vs merge_upsert
    val upsertIds = operators.Cdc.mergeUpsert(spark, Sf0001)
      .select($"doc_id").as[Long].collect().toSet
    assert(rows.keySet == upsertIds)
  }

  test("dedup_span_coverage matches a from-scratch interval-union " +
      "reference on the fixture corpus") {
    val n = operators.Dedup.SpanGramSize
    val out = operators.Dedup.spanCoverage(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // plain-Scala reference: tokenize, 5-gram per position, grams in >1
    // doc, per-doc union of [p, p+n) windows, per-source roll-up
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        graft.functions.TextAnalyzer.analyze(r.getString(2)).toVector))
    val gramDocs = scala.collection.mutable
      .Map.empty[String, scala.collection.mutable.Set[Long]]
    docs.foreach { case (id, _, toks) =>
      toks.sliding(n).filter(_.length == n).foreach { g =>
        gramDocs.getOrElseUpdate(g.mkString(" "),
          scala.collection.mutable.Set.empty) += id
      }
    }
    val dupGrams = gramDocs.collect {
      case (g, ids) if ids.size > 1 => g
    }.toSet
    val perSource = docs.groupBy(_._2).map { case (src, ds) =>
      val stats = ds.map { case (_, _, toks) =>
        val ps = toks.sliding(n).zipWithIndex.collect {
          case (g, p) if g.length == n && dupGrams(g.mkString(" ")) => p
        }.toSeq
        var covered = 0L
        var end = 0L
        ps.foreach { p =>
          covered += (p + n) - math.max(p.toLong, end)
          end = math.max(end, p.toLong + n)
        }
        (toks.length.toLong, covered)
      }
      val total = stats.map(_._1).sum
      val cov = stats.map(_._2).sum
      src -> (ds.length.toLong,
        stats.count(_._2 > 0).toLong,
        stats.count(s => s._2 * 2 >= s._1 && s._1 > 0).toLong,
        total, cov, cov * 1000000L / total)
    }
    assert(out == perSource)
    // fixture premise: planted duplicates make coverage non-trivial
    assert(out.values.exists(_._5 > 0), "no duplicated spans found")
  }

  test("quality_ppl_buckets: exact tercile split by NLL rank, " +
      "bucket means ordered, no global window in the plan") {
    val rows = operators.QualityLm.pplBuckets(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // buckets partition the scored docs into near-equal terciles
    val byBucket = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val scored = operators.QualityLm.unigramNll(spark, Sf0001).count()
    assert(byBucket.values.sum == scored)
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket.values.max - byBucket.values.min <= 1)
    // rank semantics: corpus-wide mean NLL must not decrease head ->
    // middle -> tail (weighted by docs; strict for the fixture)
    def meanOf(b: String): Double = {
      val bs = rows.filter(_._2 == b)
      bs.map(r => r._5.toDouble * r._3).sum / bs.map(_._3).sum
    }
    assert(meanOf("head") < meanOf("middle"),
      s"${meanOf("head")} !< ${meanOf("middle")}")
    assert(meanOf("middle") < meanOf("tail"))
    // scale shape: ranking must ride the bucketed prefix sum — no
    // row-level window over a single global partition
    val plan = operators.QualityLm.pplBuckets(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"), "global row_number window found")
  }

  test("ppl_buckets never ensures the FTS index (r19 verdict #6: the " +
      "bounds memo keys on the NLL table, not Fts.ensureIndex)") {
    // steady state first: the NLL table's own BUILD legitimately needs
    // the index (unigramNll reads it) — ensure it exists, then drop the
    // index's CATALOG entry. Only Fts.ensureIndex re-registers it
    // (attach is metadata-only and lives inside ensureIndex), so the
    // table reappearing would prove the quality query still forces the
    // most expensive index ensure in the repo as a side effect.
    operators.QualityLm.ensureNllTable(spark, Sf0001)
    val fts = operators.Fts.indexName(Sf0001)
    spark.sql(s"DROP TABLE IF EXISTS `$fts`")
    operators.QualityLm.pplBuckets(spark, Sf0001).count()
    assert(!spark.catalog.tableExists(fts),
      "pplBuckets re-ensured the FTS index")
  }

  test("nll score table: the persisted per-doc NLL route is " +
      "bit-identical to the inline unigramNll chain") {
    // r18: curation_report and quality_ppl_buckets read the build-once
    // graft_nll_* table (ensureNllTable) instead of re-running the
    // index join + two aggregations per invocation. Parquet must
    // round-trip the rounded doubles exactly — pin the persisted rows
    // against the inline formulation, nonEmpty-guarded.
    val inline = operators.QualityLm.unigramNll(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val table = spark
      .table(operators.QualityLm.ensureNllTable(spark, Sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(inline.nonEmpty && (table sameElements inline))
  }

  test("source_leakage: symmetric distinct-gram counts match a " +
      "driver-side recompute") {
    val n = operators.Dedup.SpanGramSize
    val out = operators.Dedup.sourceLeakage(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val bySource = Tables.documents(spark, Sf0001)
      .select("source", "text").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.flatMap(r =>
        graft.functions.TextAnalyzer.analyze(r.getString(1))
          .sliding(n).filter(_.length == n).map(_.mkString(" ")))
        .toSet).toMap
    val ref = (for {
      a <- bySource.keys; b <- bySource.keys if a < b
      shared = (bySource(a) & bySource(b)).size if shared > 0
    } yield (a, b) -> shared.toLong).toMap
    assert(out == ref)
    assert(out.nonEmpty, "fixture premise: cross-source duplicates exist")
  }

  test("split_assign partitions the corpus deterministically; " +
      "split_leakage counts exactly the cross-split near-dup pairs") {
    val splits = operators.Sampling.splitAssign(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val totalDocs = Tables.documents(spark, Sf0001).count()
    assert(splits.values.map(_._1).sum == totalDocs) // partition, no loss
    assert(splits.keys.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // train dominates at 80/10/10
    val bySplit = splits.groupBy(_._1._2).view
      .mapValues(_.values.map(_._1).sum).toMap
    assert(bySplit("train") > bySplit.getOrElse("val", 0L) &&
      bySplit("train") > bySplit.getOrElse("test", 0L))
    // leakage: recompute from the green pair set + the same hash rule
    val pairs = operators.Dedup.minhashPairs(spark, Sf0001, 0.5)
      .select($"a", $"b").as[(Long, Long)].collect()
    def splitOf(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val b = Integer.parseInt(hex.substring(0, 4), 16)
      if (b < (0.8 * 65536).toInt) "train"
      else if (b < (0.9 * 65536).toInt) "val" else "test"
    }
    val ref = pairs.map { case (a, b) =>
      val (x, y) = (splitOf(a), splitOf(b))
      (if (x <= y) x else y, if (x <= y) y else x)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = operators.Sampling.splitLeakage(spark, Sf0001, 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
    assert(got == ref)
    assert(got.values.sum == pairs.length.toLong)
  }

  test("embedding client: batch-grain remote->local fallback matches " +
      "the reference contract; vectors deterministic per path") {
    val bs = 32
    val docs = Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1)
    // driver-side expectation: batches of 32 in doc_id order; a batch
    // containing any doc_id % RemoteFailMod (97 — chosen > batch size
    // so not every batch is poisoned) == 0 falls back WHOLE to local
    val expected = docs.grouped(bs).flatMap { batch =>
      val origin =
        if (batch.exists(_._1 % operators.EmbeddingClient.RemoteFailMod == 0))
          "local" else "remote"
      batch.map(d => d._1 -> origin)
    }.toMap
    val got = operators.EmbeddingClient
      .embedCorpus(spark, Sf0001, bs, remoteReady = true)
      .collect() // single-file fixture reads in one ordered partition
    // partitioning may differ from the driver grouping; verify the
    // CONTRACT rather than exact batch membership: every remote-origin
    // doc is in a batch with no poisoned member, every poisoned doc is
    // local, and with remote down EVERYTHING is local
    got.foreach { e =>
      if (e.doc_id % operators.EmbeddingClient.RemoteFailMod == 0)
        assert(e.origin == "local", s"poisoned doc ${e.doc_id} not local")
    }
    assert(got.map(_.origin).toSet == Set("remote", "local"))
    // deterministic vectors, distinguishable by path seed
    got.take(50).foreach { e =>
      val text = docs.find(_._1 == e.doc_id).get._2
      val seed = if (e.origin == "remote") "remote-v1" else "local-v1"
      assert(e.embedding.sameElements(
        operators.EmbeddingClient.hashEmbed(seed, text)))
    }
    val down = operators.EmbeddingClient
      .embedCorpus(spark, Sf0001, bs, remoteReady = false).collect()
    assert(down.nonEmpty && down.forall(_.origin == "local"))
    assert(down.length == docs.length && got.length == docs.length)
    // the registered deterministic summary agrees with the driver-side
    // batch simulation
    val summary = operators.EmbeddingClient.embedSummary(spark, Sf0001, bs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expCounts = expected.values.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    assert(summary == expCounts, s"$summary vs $expCounts")
  }

  test("diversity_report matches a driver-side type/token and " +
      "distinct-trigram recompute") {
    val out = operators.TextOps.diversityReport(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val docs = Tables.documents(spark, Sf0001)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        graft.functions.TextAnalyzer.analyze(r.getString(1)).toVector))
    val ref = docs.groupBy(_._1).map { case (src, ds) =>
      val nTokens = ds.map(_._2.length.toLong).sum
      val nTri = ds.map(d => math.max(d._2.length - 2, 0).toLong).sum
      val dTok = ds.flatMap(_._2).toSet.size.toLong
      val dTri = ds.flatMap(_._2.sliding(3).filter(_.length == 3)
        .map(_.mkString(" "))).toSet.size.toLong
      src -> (ds.length.toLong, nTokens, dTok, dTri,
        dTok * 1000000L / nTokens, dTri * 1000000L / nTri)
    }
    assert(out == ref)
    // sanity: diversity ratios live in (0, 1e6]
    assert(out.values.forall(v => v._5 > 0 && v._5 <= 1000000L))
  }

  test("events_changepoints: shift equals a driver-side two-sample " +
      "recompute over observed buckets") {
    val w = 6
    val out = operators.Changepoints
      .eventsChangepoints(spark, Sf0001, w, 50).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.nonEmpty)
    val evTbl = Tables.events(spark, Sf0001)
    val counts = evTbl
      .select($"event_type", (Tables.tsSeconds(evTbl) / 600)
        .cast("long").as("bucket"))
      .groupBy("event_type", "bucket").count()
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).sortBy(_._1)).toMap
    out.foreach { case ((et, bucket), (sl, sr, shift)) =>
      val series = counts(et)
      val i = series.indexWhere(_._1 == bucket)
      val left = series.slice(i - w, i).map(_._2).sum
      val right = series.slice(i, i + w).map(_._2).sum
      assert(sl == left && sr == right && shift == math.abs(right - left),
        s"$et/$bucket: got ($sl,$sr,$shift), want ($left,$right)")
    }
  }

  test("ann_recall: bounded in [0, 1e6]; exhaustive probe recalls " +
      "everything") {
    val qids = SparkEntry.BatchKnnIds
    val partial = operators.Similarity
      .annRecall(spark, Sf0001, qids, 5, 10, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(partial.keySet == qids.toSet)
    assert(partial.values.forall(v => v >= 0L && v <= 1000000L))
    // nProbe = nCentroids makes the probe exhaustive: the IVF top-k IS
    // the exact top-k (same distance rounding, same tiebreak), so
    // recall must be exactly 1.0 for every query
    val full = operators.Similarity
      .annRecall(spark, Sf0001, qids, 5, 10, 10).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(full.values.forall(_ == 1000000L), s"full-probe recall: $full")
  }

  test("dedup_canonical: keeper is each cluster's highest-quality " +
      "member with lowest-id tiebreak") {
    val out = operators.Dedup.canonicalByQuality(spark, Sf0001, 0.5)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.nonEmpty)
    val clusters = operators.Dedup.nearDupClusters(spark, Sf0001, 0.5)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val q = Tables.documents(spark, Sf0001)
      .select($"doc_id", operators.TextOps.gopherRuleCount.as("q"))
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == clusters.keySet)
    out.foreach { case (cid, (size, keeper, kq)) =>
      val members = clusters(cid)
      assert(size == members.size)
      assert(members.contains(keeper))
      val best = members.map(q).max
      assert(kq == best, s"cluster $cid keeper q $kq != best $best")
      assert(keeper == members.filter(q(_) == best).min,
        s"cluster $cid tiebreak violated")
    }
  }
}
