package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("dot, norm, cosine distance on known vectors") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 1.0),  // orthogonal
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 0.0),  // identical
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), 2.0), // opposite
      (Array(3.0f, 4.0f), Array(3.0f, 4.0f), 0.0)
    ).toDF("a", "b", "expected")
    val rows = df.select(
      Similarity.cosineDistance($"a", $"b").as("d"), $"expected").collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("knn returns nearest first with deterministic tiebreak") {
    val hits = Similarity.knnCosine(spark, Sf0001, 0L, 10, 0.95).collect()
    assert(hits.nonEmpty && hits.length <= 10)
    val dists = hits.map(_.getAs[Double]("dist"))
    assert(dists.sameElements(dists.sorted))
    assert(!hits.map(_.getAs[Long]("vec_id")).contains(0L)) // self excluded
  }

  test("knn respects the distance threshold (V3, <= semantics)") {
    val hits = Similarity.knnCosine(spark, Sf0001, 0L, 100, 0.5).collect()
    hits.foreach(r => assert(r.getAs[Double]("dist") <= 0.5))
  }

  test("ivf assignment: every vector lands in exactly one cell; assignment is the argmin") {
    val emb = Tables.embeddings(spark, Sf0001)
    val asg = Similarity.ivfAssign(spark, Sf0001, emb, 10)
    assert(asg.count() == emb.count())
    // trained centroids spread the corpus across multiple cells, and
    // cell ids stay in [0, nCentroids)
    val cells = asg.select($"centroid_id").distinct()
      .collect().map(_.getLong(0))
    assert(cells.length > 1 && cells.forall(c => c >= 0 && c < 10))
    // the recorded cdist is the MINIMUM over all centroids: re-derive
    // every (vector, centroid) distance and check the per-vector min
    // equals the assignment's cdist (sampled via a full recompute at
    // fixture scale)
    val cents = spark.table(
      Similarity.ensureIvfIndex(spark, Sf0001, 10) + "_cents")
    val allDists = emb
      .select($"vec_id", $"embedding")
      .crossJoin(cents)
      .select($"vec_id", $"centroid_id",
        org.apache.spark.sql.functions.round(
          Similarity.cosineDistance($"embedding", $"cv"), 6).as("d"))
      .groupBy($"vec_id").agg(
        org.apache.spark.sql.functions.min($"d").as("mind"))
    val joined = asg.select($"vec_id", $"cdist")
      .join(allDists, "vec_id")
      .filter($"cdist" =!= $"mind")
    assert(joined.count() == 0)
  }

  test("filtered ANN: every hit carries the label; hits are the " +
      "label-restriction of the unfiltered probe's cells") {
    val lbl = 4
    val hits = Similarity.ivfTopKFiltered(spark, Sf0001, 42L, lbl,
      10, 10, 3).collect()
    assert(hits.nonEmpty)
    hits.foreach(r => assert(r.getAs[Int]("label") == lbl))
    val dists = hits.map(_.getAs[Double]("dist"))
    assert(dists.sameElements(dists.sorted))
    // same probe, no filter, large k: the filtered result is exactly
    // the label-matching subset in the same order
    val unf = Similarity.ivfTopK(spark, Sf0001, 42L, 10000, 10, 3)
      .collect().filter(_.getAs[Int]("label") == lbl)
      .map(_.getAs[Long]("vec_id")).take(hits.length)
    assert(hits.map(_.getAs[Long]("vec_id")).sameElements(unf))
  }

  test("tombstoned probe: no deleted id surfaces; survivors rank " +
      "exactly as the untombstoned probe minus the tombstones") {
    val mod = 7L
    val del = Similarity.ivfTopKDeleted(spark, Sf0001, 42L, 10, 10, mod, 3)
      .collect()
    assert(del.nonEmpty)
    del.foreach(r => assert(r.getAs[Long]("vec_id") % mod != 0))
    // recall-gate-unchanged-on-survivors: the tombstoned probe equals
    // the untombstoned probe's ordering with deleted rows dropped
    // (merge-on-read == filter semantics over the same probed cells)
    val expect = Similarity.ivfTopK(spark, Sf0001, 42L, 10000, 10, 3)
      .collect().filter(_.getAs[Long]("vec_id") % mod != 0)
      .map(_.getAs[Long]("vec_id")).take(del.length)
    assert(del.map(_.getAs[Long]("vec_id")).sameElements(expect))
  }

  test("ivfDeleteStats: per-cell totals reconcile and cover the corpus") {
    val stats = Similarity.ivfDeleteStats(spark, Sf0001, 10, 7L).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      assert(r.getAs[Long]("n_total") ==
        r.getAs[Long]("n_deleted") + r.getAs[Long]("n_live"))
    }
    val n = Tables.embeddings(spark, Sf0001).count()
    assert(stats.map(_.getAs[Long]("n_total")).sum == n)
  }

  test("compaction: vacuumed probe == tombstoned probe bit-for-bit; " +
      "compacted stats == delete-stats live counts; no dead row remains") {
    val mod = 7L
    // probe equivalence: vacuum must be invisible to results
    val vac = Similarity.ivfTopKCompacted(spark, Sf0001, 42L, 10, 10,
      mod, 3).collect()
    val del = Similarity.ivfTopKDeleted(spark, Sf0001, 42L, 10, 10,
      mod, 3).collect()
    assert(vac.nonEmpty)
    assert(vac.map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Double]("dist"))).sameElements(
      del.map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist")))))
    // occupancy reconciliation: compacted cells == delete-stats n_live
    val live = Similarity.ivfDeleteStats(spark, Sf0001, 10, mod)
      .collect().map(r => r.getAs[Long]("centroid_id") ->
        r.getAs[Long]("n_live")).filter(_._2 > 0).toMap
    val vacStats = Similarity.ivfCompactStats(spark, Sf0001, 10, mod)
      .collect().map(r => r.getAs[Long]("centroid_id") ->
        r.getAs[Long]("n_live")).toMap
    assert(vacStats == live)
    // physical: the compacted generation holds zero tombstoned rows
    val tbl = Similarity.ensureCompactedIvfIndex(spark, Sf0001, 10, mod)
    assert(spark.table(tbl).filter($"vec_id" % mod === 0).count() == 0)
  }

  test("EvalCache ground truth == inline exact computation bit-for-bit" +
      " (a divergent cache would poison every recall gate)") {
    val qids = Seq(0L, 25L, 50L)
    val cached = Similarity.knnBatchGt(spark, Sf0001, qids, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val inline = Similarity.knnBatch(spark, Sf0001, qids, 5)
      .select($"q_id", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(cached.nonEmpty)
    assert(cached.sameElements(inline))
    // second read serves the SAME persisted table (no rebuild): the
    // catalog table exists and the rows are stable
    val again = Similarity.knnBatchGt(spark, Sf0001, qids, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(again.sameElements(cached))
  }

  test("autoNCentroids: corpus-relative with a floor of 8") {
    assert(Similarity.autoNCentroids(500) == 8)
    assert(Similarity.autoNCentroids(8000) == 8)
    assert(Similarity.autoNCentroids(50000) == 50)
    assert(Similarity.autoNCentroids(1000000, 2000) == 500)
  }

  test("ivf probe results are a subset of exact knn ordering (same metric)") {
    val ivf = Similarity.ivfTopK(spark, Sf0001, 42L, 5, 10).collect()
    assert(ivf.nonEmpty)
    val dists = ivf.map(_.getAs[Double]("dist"))
    assert(dists.sameElements(dists.sorted))
  }

  test("nprobe knob: recall against exact knn is non-decreasing in probes") {
    val exact = Similarity.knnCosine(spark, Sf0001, 42L, 10, 2.0)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recalls = Seq(1, 2, 5).map { p =>
      val got = Similarity.ivfTopK(spark, Sf0001, 42L, 10, 10, p)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      got.intersect(exact).size
    }
    assert(recalls == recalls.sorted) // more probes never hurt
    assert(recalls.last >= recalls.head)
  }

  test("ivf recall gate: full probe equals exact; default probe clears " +
      "a recall floor") {
    // quantifies the approximation the DuckDB oracle can't express:
    // recall@10 over a panel of query points, against brute force.
    // Everything is deterministic (seed centroids, rounded distances,
    // id tiebreaks), so these are exact repeatable numbers, not flaky
    // statistics.
    val k = 10
    val qids = Seq(3L, 11L, 27L, 42L, 55L)
    val recalls = qids.map { q =>
      val exact = Similarity.knnCosine(spark, Sf0001, q, k, 2.0)
        .select("vec_id").as[Long].collect()
      // probing every cell IS brute force — identical metric, rounding
      // and tiebreaks must reproduce the exact list element-for-element
      val full = Similarity.ivfTopK(spark, Sf0001, q, k, 10, 10)
        .select("vec_id").as[Long].collect()
      assert(full.sameElements(exact), s"full-probe IVF != exact at q=$q")
      val ann = Similarity.ivfTopK(spark, Sf0001, q, k, 10, 2)
        .select("vec_id").as[Long].collect().toSet
      ann.intersect(exact.toSet).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    // measured 0.46 on this fixture (seed-vector centroids, 2/10 cells
    // probed — the floor pins against regression, it isn't a target;
    // production recall comes from trained centroids + higher nProbe)
    assert(mean >= 0.4, s"mean recall@10 = $mean (per-query: $recalls)")
  }

  test("batched knn: each query's slice equals the single-query exact knn") {
    val qids = Seq(0L, 7L, 42L)
    val batch = Similarity.knnBatch(spark, Sf0001, qids, 5).collect()
      .groupBy(_.getAs[Long]("q_id"))
    assert(batch.keySet == qids.toSet)
    qids.foreach { q =>
      val single = Similarity.knnCosine(spark, Sf0001, q, 5, 2.0)
        .select("vec_id", "dist").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val slice = batch(q).sortBy(_.getAs[Double]("dist"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist"))).toSeq
      assert(slice == single, s"batch slice diverges for q=$q")
    }
    // one job, one grouped-topk shuffle: the corpus side must appear
    // once, not once per query
    val plan = Similarity.knnBatch(spark, Sf0001, qids, 5)
      .queryExecution.executedPlan.toString
    assert("BroadcastExchange".r.findAllIn(plan).size == 1)
  }

  test("ivf batch routing: each query's slice equals the single-query " +
      "ivf probe") {
    val qids = Seq(0L, 42L, 88L)
    val batch = Similarity.ivfBatch(spark, Sf0001, qids, 5, 10)
      .collect().groupBy(_.getAs[Long]("q_id"))
    assert(batch.keySet == qids.toSet)
    qids.foreach { q =>
      val single = Similarity.ivfTopK(spark, Sf0001, q, 5, 10)
        .select("vec_id", "dist").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val slice = batch(q)
        .sortBy(r => (r.getAs[Double]("dist"), r.getAs[Long]("vec_id")))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist"))).toSeq
      assert(slice == single, s"ivf batch slice diverges for q=$q")
    }
  }

  test("ivf probe bucket-prunes: index scan touches < all buckets") {
    val df = Similarity.ivfTopK(spark, Sf0001, 42L, 5, 10, 2)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.isDefined, s"no bucket pruning in plan:\n$plan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt)
  }

  test("embcos pair self-join is co-located: only the final sort shuffles") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val df = Similarity.embCosinePairs(spark, Sf0001, 0.6, 10)
    df.collect()
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    val shuffles = nodes(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeLike])
    // bucketed self-join on centroid_id needs no exchange; the single
    // remaining shuffle is the global orderBy's range partitioning
    assert(shuffles <= 1, s"expected <=1 shuffle, got $shuffles")
  }

  test("incremental append: delta rows land in the right cell and are probed") {
    import org.apache.spark.sql.functions.typedLit
    val idx = Similarity.ensureIvfIndex(spark, Sf0001, 10)
    val before = spark.table(idx).count()
    // a synthetic vector equal to vector 3's must assign to the SAME
    // cell the index holds vector 3 in (identical input → identical
    // cosine argmin over the trained centroids) and surface as its
    // nearest neighbor
    val v3row = spark.table(idx).filter($"vec_id" === 3L).head()
    val v3cell = v3row.getAs[Long]("centroid_id")
    val v3cdist = v3row.getAs[Double]("cdist")
    val c3 = Tables.embeddings(spark, Sf0001)
      .filter($"vec_id" === 3L).select($"embedding").head().getSeq[Float](0)
    val delta = Seq((900001L, 99))
      .toDF("vec_id", "label")
      .withColumn("embedding", typedLit(c3))
      .select($"vec_id", $"label", $"embedding")
    try {
      Similarity.appendToIvfIndex(spark, Sf0001, 10, delta)
      assert(spark.table(idx).count() == before + 1)
      val row = spark.table(idx).filter($"vec_id" === 900001L).head()
      assert(row.getAs[Long]("centroid_id") == v3cell)
      assert(row.getAs[Double]("cdist") == v3cdist)
      // probing with qid=3 now finds the appended twin at distance 0
      val hits = Similarity.ivfTopK(spark, Sf0001, 3L, 5, 10, 1).collect()
      assert(hits.head.getAs[Long]("vec_id") == 900001L)
      assert(hits.head.getAs[Double]("dist") == 0.0)
    } finally {
      // ALWAYS drop: a failure above must not leave the fake row in the
      // shared index that later tests' ensureIvfIndex would reuse
      spark.sql(s"DROP TABLE IF EXISTS $idx")
      spark.sql(s"DROP TABLE IF EXISTS ${idx}_cents")
    }
  }

  test("embedding-cosine dedup pairs are ordered, thresholded, deduplicated") {
    val pairs = Similarity.embCosinePairs(spark, Sf0001, 0.6, 10).collect()
    pairs.foreach { r =>
      assert(r.getAs[Double]("dist") <= 0.6)
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
    }
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
  }

  test("distance dispatch: knnForCollection routes by the collection's " +
      "distance_function") {
    import graft.operators.Similarity
    // policy: label%3 -> (cosine, l2, ip)
    val dims = Similarity.vectorCollections(spark, Sf0001)
      .collect().map(r => r.getAs[Long]("collection_id") ->
        r.getAs[String]("distance_function")).toMap
    assert(dims(3L) == "cosine" && dims(4L) == "l2" && dims(5L) == "ip")
    // l2 route: column is `dist` and equals the explicit kernel
    val q4 = Similarity.minVecId(spark, Sf0001, 4)
    val viaDispatch = Similarity.knnForCollection(spark, Sf0001, 4, q4, 5)
      .collect().map(_.toString).toSeq
    val direct = Similarity.knnL2(spark, Sf0001, 4, q4, 5)
      .collect().map(_.toString).toSeq
    assert(viaDispatch == direct)
    // ip route: pgvector `<#>` semantics — neg_ip ascending, so the
    // top hit has the LARGEST inner product
    val q5 = Similarity.minVecId(spark, Sf0001, 5)
    val ip = Similarity.knnForCollection(spark, Sf0001, 5, q5, 5).collect()
    assert(ip.head.schema.fieldNames.contains("neg_ip"))
    assert(ip.map(_.getAs[Double]("neg_ip")).toSeq ==
      ip.map(_.getAs[Double]("neg_ip")).sorted.toSeq)
    // the three kernels genuinely disagree on ranking for this corpus:
    // dispatch is load-bearing, not cosmetic
    val cos = Similarity.knnForCollection(spark, Sf0001, 3,
      Similarity.minVecId(spark, Sf0001, 3), 5)
    assert(cos.schema.fieldNames.contains("dist"))
  }

  test("hierarchical IVF: full-width probe reproduces exact KNN; " +
      "narrow probe bucket-prunes; index conserves the corpus") {
    import graft.operators.{Clustering, Similarity}
    val (k1, k2) = (4, 4)
    val idx = Similarity.ensureIvfIndexHier(spark, Sf0001, k1, k2)
    // conservation: every corpus vector indexed exactly once, ids in
    // the k1*k2 grid
    val rows = spark.table(idx).collect()
    assert(rows.length == Tables.embeddings(spark, Sf0001).count())
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
    assert(rows.forall { r =>
      val c = r.getAs[Long]("centroid_id"); c >= 0 && c < k1.toLong * k2
    })
    // full-width probe (all coarse groups, all cells) = brute force:
    // must equal the exact scan's ranking bit-for-bit
    val hier = Similarity.ivfTopKHier(spark, Sf0001, 42L, 10,
      k1, k2, k1, k1 * k2)
      .select("vec_id", "dist").collect().map(_.toString).toSeq
    val exact = {
      val emb = Tables.embeddings(spark, Sf0001)
      val qv = emb.filter($"vec_id" === 42L)
        .select($"embedding".cast("array<double>"))
        .head().getSeq[Double](0)
      val qvCol = org.apache.spark.sql.functions.typedLit(qv)
      val qn = math.sqrt(qv.map(x => x * x).sum)
      emb.filter($"vec_id" =!= 42L)
        .select($"vec_id",
          org.apache.spark.sql.functions.round(
            org.apache.spark.sql.functions.lit(1.0) -
              Similarity.dot($"embedding", qvCol) /
              (Similarity.norm($"embedding") *
                org.apache.spark.sql.functions.lit(qn)), 6).as("dist"))
        .orderBy($"dist".asc, $"vec_id".asc).limit(10)
        .collect().map(_.toString).toSeq
    }
    assert(hier == exact, "full-width hier probe must equal exact KNN")
    // narrow probe: the index scan is statically bucket-pruned
    val narrow = Similarity.ivfTopKHier(spark, Sf0001, 42L, 10,
      k1, k2, 1, 2)
    val plan = narrow.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"),
      s"narrow hier probe should bucket-prune:\n$plan")
    assert(narrow.collect().nonEmpty)
    // routing arithmetic: the auto policy crosses to hier past the
    // driver bound (cells*64 > 1e7 <=> cells > 156250 <=> n > ~1.5e8)
    assert(Similarity.autoNCentroids(500L).toLong * 64 <=
      Clustering.MaxDriverCentroidCells)
    assert(Similarity.autoNCentroids(200000000L).toLong * 64 >
      Clustering.MaxDriverCentroidCells)
  }

  test("embedding-dimension gate flags mis-dimensioned vectors") {
    import graft.operators.DocumentPipeline
    val emb = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)), // ok (declared 3)
      (1L, Array(1.0f, 2.0f)),       // wrong dim
      (2L, Array(9.0f))              // ok (declared 1)
    ).toDF("collection_id", "embedding")
    val dims = Seq((1L, 3), (2L, 1))
      .toDF("collection_id", "embedding_dimension")
    val out = DocumentPipeline.validateEmbeddingDimFrame(emb, dims)
      .collect().map(r => r.getAs[Long]("collection_id") ->
        (r.getAs[Long]("n_valid"), r.getAs[Long]("n_invalid"))).toMap
    assert(out(1L) == (1L, 1L))
    assert(out(2L) == (1L, 0L))
    // the fixture itself is fully valid at the declared 64
    val fx = DocumentPipeline.validateEmbeddingDim(spark, Sf0001).collect()
    assert(fx.forall(_.getAs[Long]("n_invalid") == 0L))
    assert(fx.map(_.getAs[Long]("n_vectors")).sum == 500L)
  }
}
