package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  test("simhash pairs: banding finds exactly the brute-force Hamming pairs") {
    import graft.operators.Dedup
    val fps = Dedup.simhash(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash"))
    val brute = (for {
      (a, ha) <- fps; (b, hb) <- fps if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 1
    } yield (a, b)).toSet
    val banded = Dedup.simhashPairs(spark, Sf0001, 1).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(banded == brute) // pigeonhole completeness, no extras
  }

  test("near-dup clusters: pairs co-clustered, keeper is the cluster minimum") {
    import graft.operators.Dedup
    val clusters = Dedup.nearDupClusters(spark, Sf0001, 0.5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val pairs = Dedup.minhashPairs(spark, Sf0001, 0.5).collect()
    assert(pairs.nonEmpty && clusters.nonEmpty)
    // every near-dup pair's endpoints land in the same cluster
    pairs.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // cluster label IS the member minimum (the canonical keeper)
    clusters.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min == label)
    }
  }
  import spark.implicits._

  test("shingles: 3-gram windows over analyzed tokens; short docs yield none") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta"), // < 3 tokens -> no shingles
      (3L, "")
    ).toDF("doc_id", "text")
    val sh = Dedup.docShingles(df).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(sh.toSet == Set(
      (1L, "alpha beta gamma"), (1L, "beta gamma delta")))
  }

  test("exact-normalized dedup groups docs with identical token sets") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma  BETA alpha!!"), // same set, different order/case/punct
      (3L, "alpha beta delta")
    ).toDF("doc_id", "text")
    val sig = df.select(col("doc_id"),
      md5(array_join(array_sort(array_distinct(
        graft.functions.TextAnalyzer.tokens(col("text")))), " ")).as("sig"))
    val groups = sig.groupBy("sig").agg(
      min("doc_id").as("keep_id"), count(lit(1)).as("n")).collect()
    val dupGroup = groups.find(_.getAs[Long]("n") == 2L)
    assert(dupGroup.isDefined && dupGroup.get.getAs[Long]("keep_id") == 1L)
  }

  test("minhash signature is deterministic and set-based") {
    val df = Seq(
      (1L, "one two three four five six"),
      (2L, "six five four three two one") // same token set
    ).toDF("doc_id", "text")
    val toks = df.select(col("doc_id"),
      explode(array_distinct(
        graft.functions.TextAnalyzer.tokens(col("text")))).as("token"))
    val sigs = Dedup.minhashSignature(toks).collect()
    val s1 = sigs.find(_.getLong(0) == 1L).get.toSeq.drop(1)
    val s2 = sigs.find(_.getLong(0) == 2L).get.toSeq.drop(1)
    assert(s1 == s2) // order-insensitive
  }

  test("planted near-duplicates are found by minhash LSH at 0.5") {
    val pairs = Dedup.minhashPairs(spark, Sf0001, 0.5).collect()
    assert(pairs.nonEmpty) // fixture corpus has planted dups (jaccard ~0.99)
    pairs.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.5))
    pairs.foreach(r => assert(r.getAs[Long]("a") < r.getAs[Long]("b")))
  }

  test("simhash: 64-bit fingerprint; near-identical docs get close fingerprints") {
    val fps = Dedup.simhash(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.size == 500)
    // 64 bits actually used: the high half is not dead weight
    assert(fps.values.exists(v => (v >>> 32) != 0L))
    assert(fps.values.toSet.size > 400, "fingerprint space saturated")
    // the planted dup pairs should have hamming distance 0 or tiny
    val dupPairs = Dedup.minhashPairs(spark, Sf0001, 0.9).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    // random 64-bit pairs expect hamming ~32; planted near-dups sit
    // far below that
    dupPairs.take(5).foreach { case (a, b) =>
      val ham = java.lang.Long.bitCount(fps(a) ^ fps(b))
      assert(ham <= 12, s"hamming($a,$b)=$ham")
    }
  }

  test("ppjoin prefix filtering equals the full posting join") {
    val t = 0.5
    val pp = graft.operators.Dedup.ppjoinPairs(spark, Sf0001, t)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSet
    val full = graft.operators.Dedup
      .shingleJaccardPairs(spark, Sf0001, t)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSet
    assert(pp == full, s"ppjoin ${pp.size} vs full ${full.size}")
    assert(pp.nonEmpty)
    graft.operators.CacheScope.release(spark)
  }

  test("maximal duplicated substrings: a planted exact-n run reports " +
      "at exactly its length; >=cap runs land on the cap level") {
    import spark.implicits._
    // two docs share EXACTLY a 6-token run ("alpha bravo charlie delta
    // echo foxtrot") with different surroundings, two more share a
    // 14-token run (>= cap 10)
    val six = "alpha bravo charlie delta echo foxtrot"
    val long = (1 to 14).map(i => s"word$i").mkString(" ")
    val df = Seq(
      (1L, s"unique1 prefix1 $six suffix1 tailone"),
      (2L, s"unique2 prefix2 $six suffix2 tailtwo"),
      (3L, s"opena openb $long closea"),
      (4L, s"openc opend $long closeb")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-sub").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.operators.Dedup
      .maximalDuplicatedSubstrings(spark, tmp, 5, 10, 100)
      .collect()
      .map(r => (r.getAs[Long]("length"), r.getAs[String]("gram")))
    // the 6-run is maximal at 6 — present at length 6, absent at 5
    assert(out.contains((6L, six)))
    assert(!out.exists { case (l, g) => l == 5L && six.contains(g) },
      "a 5-token sub-run of the 6-run should be suppressed as non-maximal")
    // the 14-run reports at the cap (10), not below
    val capGrams = out.filter(_._1 == 10L).map(_._2)
    assert(capGrams.exists(long.contains _))
    assert(!out.exists { case (l, g) => l < 10L && long.contains(g) },
      "sub-runs of the capped run should be suppressed below the cap")
    graft.operators.CacheScope.release(spark)
  }

  test("span removal: cross-doc runs are cut, unique text survives, " +
      "fully-duplicated docs empty out") {
    import spark.implicits._
    val run = "alpha bravo charlie delta echo" // exactly 5 tokens
    val df = Seq(
      (1L, s"unique1 text1 $run tail1"),
      (2L, s"unique2 text2 $run tail2"),
      (3L, run),            // fully covered -> empties out
      (4L, "lonely words without any duplicate content here")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-rm").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.operators.Dedup.removeDuplicatedSpans(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("n_removed"),
          r.getAs[String]("cleaned_md5"))).toMap
    // docs 1/2: the 5-token run cut, 3 unique tokens kept
    assert(out(1L)._1 == 3 && out(1L)._2 == 5)
    assert(out(2L)._1 == 3 && out(2L)._2 == 5)
    // doc 3: fully covered -> empty-string md5
    assert(out(3L) == (0L, 5L, "d41d8cd98f00b204e9800998ecf8427e"))
    // doc 4: untouched
    assert(out(4L)._2 == 0 && out(4L)._1 > 0)
    graft.operators.CacheScope.release(spark)
  }

  test("training triplets: positive is the best verified partner, " +
      "negative is never a near-dup, draw is deterministic") {
    val t = 0.5
    val trips = Dedup.trainingTriplets(spark, Sf0001, t).collect()
    assert(trips.nonEmpty)
    val pairs = Dedup.minhashPairs(spark, Sf0001, t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val partnerOf = (pairs.map(p => (p._1, (p._2, p._3))) ++
      pairs.map(p => (p._2, (p._1, p._3))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    trips.foreach { r =>
      val (a, p, j, n) = (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))
      val ps = partnerOf(a)
      // positive = max jaccard, min id tiebreak
      val best = ps.sortBy(x => (-x._2, x._1)).head
      assert((p, j) == best, s"anchor $a positive $p/$j vs $best")
      // negative: not self/positive/any partner
      assert(n != a && n != p && !ps.exists(_._1 == n))
    }
    // one triplet per anchor, deterministic across runs
    assert(trips.map(_.getLong(0)).distinct.length == trips.length)
    val again = Dedup.trainingTriplets(spark, Sf0001, t).collect()
    assert(trips.map(_.toString).toSeq == again.map(_.toString).toSeq)
    graft.operators.CacheScope.release(spark)
  }

  test("curation_apply: survivor set equals the keep decisions, " +
      "digest reconciles count-for-count with curation_decisions") {
    val t = 0.5
    val applied = Dedup.curationApply(spark, Sf0001, t).collect()
    val keepIds = Dedup.curationDocDecisions(spark, Sf0001, t)
      .filter(org.apache.spark.sql.functions.col("decision") === "keep")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // exactly the keep-decision docs survive, one row each
    assert(applied.map(_.getLong(0)).sorted.toSeq == keepIds)
    // token accounting holds per doc
    applied.foreach { r =>
      val (nt, nk, nr) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nk >= 0 && nk <= nt && nr == nt - nk, r.toString)
    }
    // the digest table's decision counts equal curation_decisions'
    val dec = Dedup.curationDecisions(spark, Sf0001, t).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val dig = Dedup.curationApplyDigest(spark, Sf0001, t).collect()
    dig.foreach { r =>
      val src = r.getString(0)
      def cnt(d: String) = dec.getOrElse((src, d), 0L)
      assert(r.getLong(2) == cnt("exact_dup"), s"$src exact_dup")
      assert(r.getLong(3) == cnt("near_dup"), s"$src near_dup")
      assert(r.getLong(4) == cnt("quality"), s"$src quality")
      assert(r.getLong(5) == cnt("keep"), s"$src keep")
      assert(r.getLong(1) ==
        cnt("exact_dup") + cnt("near_dup") + cnt("quality") + cnt("keep"))
    }
    // n_docs totals cover the whole corpus
    assert(dig.map(_.getLong(1)).sum ==
      Tables.documents(spark, Sf0001).count())
    // post-dedup semantics: a span duplicated only via a removed copy
    // survives, so survivor docs can only keep MORE tokens than the
    // full-corpus span pass would leave them
    val fullPass = Dedup.removeDuplicatedSpans(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    applied.foreach { r =>
      assert(r.getLong(3) >= fullPass(r.getLong(0)),
        s"doc ${r.getLong(0)}: survivor pass kept fewer tokens than " +
          "the full-corpus pass")
    }
    graft.operators.CacheScope.release(spark)
  }
}
