package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class Round8OpsSpec extends SparkSpec {

  test("scale deciles equal exact ntile when 10 divides N") {
    val n = Tables.customer(spark, Sf0001).count()
    assert(n % 10 == 0, s"fixture premise: N=$n divisible by 10")
    val exact = Relational.customerDeciles(spark, Sf0001).collect()
      .map(_.toSeq).toSeq
    val scale = Relational.customerDecilesScale(spark, Sf0001).collect()
      .map(_.toSeq).toSeq
    assert(scale == exact)
  }

  test("lang-keyed analyzer: stopwords per language, stemmer en-only") {
    import graft.functions.TextAnalyzer
    // French function words drop under fr, survive under en
    assert(TextAnalyzer.analyzeFor("le merge et la table", "fr") ==
      Seq("merge", "table"))
    assert(TextAnalyzer.analyzeFor("le merge et la table", "en") ==
      Seq("le", "merge", "et", "la", "table"))
    // unsupported language: bare tokenization keeps English stopwords
    assert(TextAnalyzer.analyzeFor("the stream filter", "zh") ==
      Seq("the", "stream", "filter"))
    // stemmer bypass: non-en stemmed analysis is plain analysis
    assert(TextAnalyzer.analyzeStemmedFor("merging tables", "fr") ==
      TextAnalyzer.analyzeFor("merging tables", "fr"))
    assert(TextAnalyzer.analyzeStemmedFor("merging tables", "en") ==
      Seq("merg", "tabl"))
  }

  test("fr search: French stopwords reduce the query to content terms") {
    import graft.operators.Fts
    val fr = Fts.searchLang(spark, Sf0001, "le merge et la table", "fr", 10)
      .collect()
    assert(fr.nonEmpty)
    fr.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(s > 0 && s <= 1)
    }
  }

  test("scale deciles plan has no global-order row-level window") {
    val plan = Relational.customerDecilesScale(spark, Sf0001)
      .queryExecution.optimizedPlan.toString
    // every windowspec carries a partition column: the row_number is
    // bucket-partitioned and the offset window (bounded, <=10 rows)
    // keys on its non-foldable constant
    plan.split("\n").filter(_.contains("windowspecdefinition"))
      .foreach { line =>
        assert(line.contains("windowspecdefinition(_pid") ||
          line.contains("windowspecdefinition(_w"),
          s"unpartitioned window: $line")
      }
  }

  // ---- bigram LM / PMI / dedup reduction --------------------------------

  test("bigram NLL matches a from-scratch Scala scorer on the fixture") {
    import graft.functions.TextAnalyzer
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> TextAnalyzer.analyze(r.getString(1)))
    val train = docs.filter(_._1 % 10 != 7)
    val eval = docs.filter(_._1 % 10 == 7)
    def bigrams(ts: Seq[String]) = ts.sliding(2).filter(_.size == 2)
      .map(p => p.head + " " + p(1)).toSeq
    val cb = train.flatMap(d => bigrams(d._2))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cu = train.flatMap(_._2)
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val n = train.map(_._2.length.toLong).sum
    val expected = eval.flatMap { case (id, ts) =>
      val bs = bigrams(ts)
      if (bs.isEmpty) None
      else {
        val s9 = bs.groupBy(identity).map { case (bg, occ) =>
          val Array(w1, w2) = bg.split(" ")
          val s = cb.get(bg) match {
            case Some(c) => c.toDouble / cu(w1)
            case None    => 0.4 * cu.getOrElse(w2, 1L).toDouble / n
          }
          math.rint(occ.length * math.log(s) * 1e9).toLong
        }.sum
        Some(id -> BigDecimal(-(s9.toDouble / 1e9) / bs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toMap
    val got = operators.Ngrams.bigramNll(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("nll")).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, nll) =>
      assert(math.abs(nll - expected(id)) < 1e-9, s"doc $id")
    }
    // the held-out split must actually exercise backoff, or the stupid-
    // backoff branch is dead code at fixture scale
    val evalBigrams = eval.flatMap(d => bigrams(d._2)).toSet
    assert((evalBigrams -- cb.keySet).nonEmpty,
      "every eval bigram was in the train model — backoff untested")
  }

  test("PMI collocations: threshold respected, score recomputes") {
    import graft.functions.TextAnalyzer
    val rows = operators.Ngrams.pmiCollocations(spark, Sf0001, 5L, 20)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getAs[Long]("n") >= 5L))
    // descending by pmi with bigram tiebreak = a total order
    val keys = rows.map(r => (-r.getAs[Double]("pmi"),
      r.getAs[String]("bigram")))
    assert(keys.sameElements(keys.sorted))
    // recompute the top row's PMI from raw counts
    val docs = Tables.documents(spark, Sf0001)
      .select("text").collect().map(r => TextAnalyzer.analyze(r.getString(0)))
    val bs = docs.flatMap(_.sliding(2).filter(_.size == 2)
      .map(p => p.head + " " + p(1)))
    val us = docs.flatMap(identity)
    val top = rows.head
    val bg = top.getAs[String]("bigram")
    val Array(w1, w2) = bg.split(" ")
    val pmi = math.log((bs.count(_ == bg).toDouble / bs.length) /
      ((us.count(_ == w1).toDouble / us.length) *
        (us.count(_ == w2).toDouble / us.length)))
    assert(math.abs(top.getAs[Double]("pmi") - pmi) < 1e-5)
  }

  test("round-8 plans: no cartesian products; reduction join broadcasts") {
    Seq(
      "quality_bigram_lm" -> operators.Ngrams.bigramNll(spark, Sf0001),
      "pmi_collocations" ->
        operators.Ngrams.pmiCollocations(spark, Sf0001, 5L, 20),
      "knn_batch" ->
        operators.Similarity.knnBatch(spark, Sf0001, Seq(0L, 7L), 5)
    ).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
    // the cluster flags (only docs with a near-dup) broadcast against
    // the full corpus scan — never a corpus-grain shuffle
    val red = operators.Dedup.dedupReduction(spark, Sf0001, 0.5)
    val plan = red.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "reduction's docs-flags join is not broadcast")
  }

  test("BoundedTopK aggregator: row-equal to the window top-k, " +
      "partial-aggregates map-side") {
    val win = Relational.topOrdersPerCustomer(spark, Sf0001).collect()
      .map(_.toSeq).toSeq
    val agg = Relational.topOrdersPerCustomerScale(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(agg == win)
    // the scale claim: two ObjectHashAggregates (partial, final) around
    // the exchange — the shuffle carries k-capped buffers, not rows —
    // and no row-level window anywhere
    val plan = Relational.topOrdersPerCustomerScale(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(
      "ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"no partial/final aggregate pair:\n$plan")
    assert(!plan.contains("Window"), "unexpected window operator")
    // merge-order independence: reduce/merge from any partitioning
    // reach the same k-set
    val a = new graft.functions.BoundedTopK(3)
    val rows = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (4L, 1.0), (5L, 7.0))
      .map { case (i, s) => graft.functions.Scored(i, s) }
    val whole = rows.foldLeft(a.zero)(a.reduce)
    rows.permutations.take(24).foreach { p =>
      val (l, r) = p.splitAt(2)
      val merged = a.merge(l.foldLeft(a.zero)(a.reduce),
        r.foldLeft(a.zero)(a.reduce))
      assert(merged == whole, s"order-dependent result for $p")
    }
    assert(whole.map(_.id) == Seq(2L, 3L, 5L)) // 9.0, 9.0(tie->id), 7.0
  }

  test("dedup reduction: partitions the corpus, reconciles with clusters") {
    val rows = operators.Dedup.dedupReduction(spark, Sf0001, 0.5).collect()
    val docs = Tables.documents(spark, Sf0001)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") ==
        r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("chars_removed") >= 0L)
    }
    val totalChars = docs.agg(sum(col("n_chars"))).head.getLong(0)
    assert(rows.map(r => r.getAs[Long]("chars_kept") +
      r.getAs[Long]("chars_removed")).sum == totalChars)
    // removed == non-keeper cluster members, corpus-wide
    val nonKeepers = operators.Dedup.nearDupClusters(spark, Sf0001, 0.5)
      .filter(!col("is_keeper")).count()
    assert(rows.map(_.getAs[Long]("n_removed")).sum == nonKeepers)
  }

  test("quota sample scale form: row-equal to the window draw, " +
      "no window in the plan") {
    import org.apache.spark.sql.expressions.Window
    val quota = 7
    val scale = operators.Sampling
      .stratifiedQuotaScale(spark, Sf0001, quota)
      .collect().map(_.toSeq).toSeq
    // window formulation over the SAME 13-hex-digit rank key
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 13),
      16, 10).cast("double")
    val w = Window.partitionBy("lang").orderBy(h.asc, col("doc_id").asc)
    val win = Tables.documents(spark, Sf0001)
      .select(col("lang"), col("doc_id"),
        row_number().over(w).cast("long").as("pick"))
      .filter(col("pick") <= quota)
      .orderBy(col("lang").asc, col("pick").asc)
      .collect().map(_.toSeq).toSeq
    assert(scale == win)
    // every stratum fills its quota (fixture has >> quota docs/lang)
    val perLang = scale.groupBy(_.head).view.mapValues(_.size)
    assert(perLang.values.forall(_ == quota), perLang.toMap.toString)
    // scale claim: partial/final aggregate pair, no row-level window
    val plan = operators.Sampling
      .stratifiedQuotaScale(spark, Sf0001, quota)
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"no partial/final aggregate pair:\n$plan")
    assert(!plan.contains("Window"), "unexpected window operator")
  }

  test("select_budget: greedy best-first fill matches a driver-side " +
      "reference and stops at the budget") {
    val budget = 3000L
    val out = operators.Sampling.selectBudget(spark, Sf0001, budget)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("worst_grade")))
      .toSeq
    // driver-side greedy reference: grade desc, doc_id asc, take while
    // tokens-before < budget (straddler included)
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("source"),
        size(graft.functions.TextAnalyzer.tokens(col("text")))
          .cast("long").as("toks"),
        operators.TextOps.gopherRuleCount.as("q"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy { case (id, _, _, q) => (5L - q, id) }
    val sel = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long)]
    var cum = 0L
    docs.foreach { d =>
      if (cum < budget) { sel += d; cum += d._3 }
    }
    val ref = sel.groupBy(_._2).map { case (src, ds) =>
      (src, ds.size.toLong, ds.map(_._3).sum, ds.map(_._4).min)
    }.toSeq.sortBy(_._1)
    assert(out == ref)
    // the fill reaches the budget and is a strict subset of the corpus
    val total = docs.map(_._3).sum
    val got = out.map(_._3).sum
    assert(got >= budget && got < total, s"got=$got budget=$budget")
    // quality-monotone: every selected grade >= every unselected grade
    // is too strong under the doc_id tiebreak at the cut grade; what
    // must hold is that no UNSELECTED doc outgrades the worst selected
    val selIds = sel.map(_._1).toSet
    val worstSel = sel.map(_._4).min
    val bestUnsel = docs.filterNot(d => selIds.contains(d._1))
      .map(_._4).max
    assert(bestUnsel <= worstSel,
      s"unselected grade $bestUnsel beats selected $worstSel")
  }

  test("merge_upsert: latest version wins, deletes beat updates, " +
      "inserts survive") {
    val out = operators.Cdc.mergeUpsert(spark, Sf0001).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val baseIds = Tables.documents(spark, Sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every 10th doc revised to version 2, unless deleted (every 17th)
    baseIds.foreach { id =>
      if (id % 17 == 0) assert(!byId.contains(id), s"$id not deleted")
      else if (id % 10 == 0)
        assert(byId(id).getAs[Long]("version") == 2L, s"$id not updated")
      else assert(byId(id).getAs[Long]("version") == 1L)
    }
    // inserts appear under the shifted id, version 2
    baseIds.filter(_ % 25 == 0).foreach { id =>
      assert(byId.contains(id + 1000000L), s"insert ${id + 1000000L}")
      assert(byId(id + 1000000L).getAs[Long]("version") == 2L)
    }
    // the winning CONTENT is the revised text for updated docs
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), substring(md5(col("text")), 1, 8).as("s0"),
        substring(md5(concat(col("text"), lit(" [rev]"))), 1, 8).as("s2"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    docs.foreach { case (id, s0, s2) =>
      byId.get(id).foreach { r =>
        val want = if (id % 10 == 0) s2 else s0
        assert(r.getAs[String]("content_sig") == want, s"doc $id sig")
      }
    }
    // scale shape: broadcast anti-join, partial-aggregable max_by
    val plan = operators.Cdc.mergeUpsert(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), s"delete join not broadcast anti:\n$plan")
  }

  test("pagerank_dups matches a driver-side integer PageRank on the " +
      "same edges") {
    val threshold = 0.5
    val out = operators.GraphOps.pagerankDups(spark, Sf0001, threshold, 20)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("degree"),
        r.getAs[Long]("rank_nano")))
      .toSeq
    // reference: same integer recurrence, computed in plain Scala
    val pairs = operators.Dedup.minhashPairs(spark, Sf0001, threshold)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = deg.keys.map(_ -> 1000000000L).toMap
    for (_ <- 1 to operators.GraphOps.Iterations) {
      val mass = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = mass.map { case (id, m) => id -> (150000000L + 85 * m / 100) }
    }
    val ref = rank.toSeq.map { case (id, r) => (id, deg(id), r) }
      .sortBy { case (id, _, r) => (-r, id) }.take(20)
    assert(out == ref)
    assert(out.nonEmpty && out.forall(_._3 > 0))
  }

  test("nb classifier: every held-out doc classified once, classes " +
      "come from training, scoring joins broadcast") {
    val conf = operators.Classifier.nbConfusion(spark, Sf0001).collect()
    val classified = conf.map(_.getAs[Long]("n_docs")).sum
    val nTest = Tables.documents(spark, Sf0001)
      .filter(col("doc_id") % operators.Classifier.Split === 0).count()
    assert(classified == nTest, s"$classified of $nTest classified")
    val trainLangs = Tables.documents(spark, Sf0001)
      .filter(col("doc_id") % operators.Classifier.Split =!= 0)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(conf.map(_.getAs[String]("pred_lang")).toSet
      .subsetOf(trainLangs))
    // model artifact: k rows per class, ranks 1..k, counts descending
    val model = operators.Classifier.nbModel(spark, Sf0001, 3).collect()
    model.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L),
        s"ranks for $lang")
      val ns = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("n"))
      assert(ns.sorted.reverse.toSeq == ns.toSeq, s"counts not desc: $lang")
      rows.foreach(r => assert(r.getAs[Long]("logp_nano") < 0))
    }
    // scale shape: the model-side joins of the scoring scan broadcast
    val plan = operators.Classifier.nbConfusion(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("integer k-means matches a driver-side Lloyd reference; " +
      "centroid join broadcasts") {
    val k = 4
    val out = operators.Clustering.kmeansClusters(spark, Sf0001, k)
      .collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("n_vecs"),
        r.getAs[Long]("energy")))
      .toSeq
    // reference: identical integer recurrence in plain Scala
    val vecs = Tables.embeddings(spark, Sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x =>
          math.rint(x.toDouble * 1e6).toLong).toArray)
      .sortBy(_._1)
    val dim = vecs.head._2.length
    // round-10 seeding: the k vec_ids with the smallest md5(id) —
    // hash-spread, mirrored here exactly
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byId = vecs.toMap
    val seedIds = vecs.map(_._1)
      .sortBy(id => (md5hex(id.toString), id)).take(k)
    var cent = seedIds.map(id => byId(id).clone).toArray
    var assign = Map.empty[Long, Int]
    for (_ <- 1 to operators.Clustering.Iterations) {
      assign = vecs.map { case (id, v) =>
        val key = cent.zipWithIndex.map { case (c, ci) =>
          var d = 0L
          var i = 0
          while (i < dim) { val t = v(i) - c(i); d += t * t; i += 1 }
          d * k + ci
        }.min
        id -> (key % k).toInt
      }.toMap
      cent = (0 until k).map { ci =>
        val members = vecs.filter(v => assign(v._1) == ci)
        if (members.isEmpty) cent(ci)
        else Array.tabulate(dim) { i =>
          members.map(_._2(i)).sum / members.length // JVM / == div
        }
      }.toArray
    }
    val ref = (0 until k).map { ci =>
      val n = assign.values.count(_ == ci).toLong
      val energy = cent(ci).map(c => c * c).sum
      (ci.toLong, n, energy)
    }
    assert(out == ref)
    // every vector assigned, clusters non-trivial at fixture scale
    assert(out.map(_._2).sum == vecs.length.toLong)
    // scale shape: the per-iteration centroid join is broadcast
    val plan = operators.Clustering.kmeansClusters(spark, Sf0001, k)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast:\n$plan")
  }

  test("bpe_merges matches a from-scratch Sennrich reference on the " +
      "fixture corpus") {
    val out = operators.Bpe.bpeMerges(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
      .toSeq
    // reference: plain-Scala BPE on the same word-frequency table
    val wf = scala.collection.mutable.Map.empty[Vector[String], Long]
    Tables.documents(spark, Sf0001).select("text").collect()
      .flatMap(r => graft.functions.TextAnalyzer.analyze(r.getString(0)))
      .foreach { w =>
        val k = w.map(_.toString).toVector
        wf(k) = wf.getOrElse(k, 0L) + 1L
      }
    // batched-pass reference: per pass, rank snapshot pair counts, take
    // the top BatchSize, keep the non-conflicting ones (shared rule),
    // and apply them all — symbol-disjointness makes per-pair
    // sequential scan-replace equal to the simultaneous rewrite
    val ref = Seq.newBuilder[(Long, String, String, Long)]
    var words = wf.toMap
    var step = 0L
    for (_ <- 1 to operators.Bpe.Passes) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val ranked = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }
        .take(operators.Bpe.BatchSize)
        .map { case ((a, b), c) => (a, b, c) }
      val kept = operators.Bpe.keepNonConflicting(ranked)
      kept.foreach { case (l, r, cnt) =>
        step += 1; ref += ((step, l, r, cnt))
        // greedy left-to-right scan-replace (Sennrich merge)
        words = words.toSeq.map { case (syms, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toVector -> f
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    assert(out == ref.result())
    // merged symbols compound: some late-step side is multi-char
    assert(out.drop(4).exists(m => m._2.length > 1 || m._3.length > 1),
      s"no compound merges in $out")
    // the applied vocab surfaces learned multi-char tokens
    val vocab = operators.Bpe.bpeVocab(spark, Sf0001, 20).collect()
      .map(_.getString(0))
    assert(vocab.exists(_.length > 1), s"no learned token in top-20")
  }

  test("cdc boundaries: driver recompute agrees; boundaries are " +
      "shift-robust past the window") {
    def boundaries(text: String, divisor: Int): Seq[Int] = {
      val w = operators.Chunker.CdcWindow
      (w to text.length).filter { i =>
        val h = (0 until w).map { k =>
          text.charAt(i - w + k).toLong *
            math.pow(31, w - 1 - k).toLong
        }.sum
        h % divisor == 0
      }
    }
    val docs = Tables.documents(spark, Sf0001)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val chunks = ds.map(d => boundaries(d._2, 64).size + 1L)
      (src, ds.size.toLong, chunks.sum,
        ds.map(_._2.length.toLong).sum / chunks.sum)
    }.toSeq.sortBy(_._1)
    val got = operators.Chunker.cdcChunks(spark, Sf0001, 64).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("total_chunks"), r.getAs[Long]("avg_chunk_chars")))
      .toSeq
    assert(got == expect)
    // content-defined property: a prefix insertion shifts every
    // boundary past the first window by exactly the prefix length
    val t = docs.head._2
    val shifted = boundaries("XY" + t, 64).filter(_ > 10).map(_ - 2)
    val orig = boundaries(t, 64).filter(_ > 8)
    assert(shifted == orig, "boundaries not shift-robust")
  }

  test("dsir weights rank target-source docs up; compression joins " +
      "broadcast") {
    val out = operators.Sampling.dsirWeights(spark, Sf0001, "src0", 20)
      .collect()
    assert(out.length == 20)
    val imps = out.map(_.getAs[Long]("imp_nano")).toSeq
    assert(imps == imps.sorted.reverse, "not importance-ordered")
    // the target-domain LM must on average prefer its own documents:
    // mean importance of src0 docs > mean of the rest (corpus-wide)
    val all = operators.Sampling
      .dsirWeights(spark, Sf0001, "src0", 1000000).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("imp_nano")))
    val (tgt, rest) = all.partition(_._1 == "src0")
    def mean(xs: Array[(String, Long)]) =
      xs.map(_._2).sum.toDouble / xs.length
    assert(mean(tgt) > mean(rest),
      s"target mean ${mean(tgt)} not above rest ${mean(rest)}")
    val plan = operators.Bpe.bpeCompression(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"vocab join:\n$plan")
  }

  test("hierarchical k-means: conserves vectors, refines the coarse " +
      "partition, and kmeansAuto routes by the driver bound") {
    import operators.Clustering
    val (k1, k2) = (4, 4)
    val (assign, cent) = Clustering.fitHierarchical(spark, Sf0001, k1, k2)
    val rows = assign.collect()
    // every vector assigned exactly once, ids within the k1*k2 grid
    assert(rows.length == Tables.embeddings(spark, Sf0001).count())
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
    assert(rows.forall { r =>
      val c = r.getAs[Long]("cluster"); c >= 0 && c < k1.toLong * k2
    })
    // level 2 refines level 1: each final cluster's members share ONE
    // coarse cluster (cluster div k2 recovers it)
    val (coarse, _) = Clustering.kmeansAuto(spark, Sf0001, k1)
    val coarseOf = coarse.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("cluster") / k2 ==
        coarseOf(r.getAs[Long]("vec_id")))
    }
    // centroid frame covers only seeded (coarse, sub) cells, 64 dims each
    val centRows = cent.collect()
    assert(centRows.length % 64 == 0)
    assert(centRows.length <= k1 * k2 * 64)
    // routing arithmetic: flat under the bound, hierarchical above
    assert(8L * 64 <= Clustering.MaxDriverCentroidCells)
    assert(200000L * 64 > Clustering.MaxDriverCentroidCells)
  }
}
