package graft

import graft.operators.{Fts, Hybrid, Similarity}

class HybridSpec extends SparkSpec {

  test("rrf fuses both lists: docs in both rank above single-list docs of equal rank") {
    val out = Hybrid
      .rrfSearch(spark, Sf0001, "hash join merge", "en", 0L, 20, 60, 50)
      .collect()
    assert(out.nonEmpty)
    // scores strictly follow 1/(60+fr) + 1/(60+vr) with nulls as 0
    out.foreach { r =>
      val fr = Option(r.getAs[java.lang.Long]("fts_rank")).map(_.toLong)
      val vr = Option(r.getAs[java.lang.Long]("knn_rank")).map(_.toLong)
      val expected =
        fr.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
          vr.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") -
        math.rint(expected * 1e6) / 1e6) < 1e-9)
      assert(fr.isDefined || vr.isDefined)
    }
    // output is sorted by (rrf desc, id asc)
    val keys = out.map(r => (-r.getAs[Double]("rrf"), r.getAs[Long]("id")))
    assert(keys.sameElements(keys.sorted))
  }

  test("rrf membership equals the union of the two top-k lists") {
    val kEach = 15
    val fts = Fts.search(spark, Sf0001, "hash join merge", "en", kEach)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val knn = Similarity.knnCosine(spark, Sf0001, 0L, kEach, 2.0)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val fused = Hybrid
      .rrfSearch(spark, Sf0001, "hash join merge", "en", 0L, kEach, 60, 1000)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(fused == (fts ++ knn))
  }

  test("a doc present in both lists outscores one present in a single list at the same ranks") {
    val out = Hybrid
      .rrfSearch(spark, Sf0001, "hash join merge", "en", 0L, 20, 60, 1000)
      .collect()
    val both = out.filter(r =>
      r.getAs[java.lang.Long]("fts_rank") != null &&
        r.getAs[java.lang.Long]("knn_rank") != null)
    val single = out.filter(r =>
      r.getAs[java.lang.Long]("fts_rank") == null ||
        r.getAs[java.lang.Long]("knn_rank") == null)
    if (both.nonEmpty && single.nonEmpty) {
      // any doc in both lists beats any doc whose single rank is >= its worse rank
      val b = both.head
      val worse = math.max(b.getAs[Long]("fts_rank"), b.getAs[Long]("knn_rank"))
      single.filter { s =>
        val r = Option(s.getAs[java.lang.Long]("fts_rank"))
          .getOrElse(s.getAs[java.lang.Long]("knn_rank")).toLong
        r >= worse
      }.foreach(s =>
        assert(b.getAs[Double]("rrf") > s.getAs[Double]("rrf")))
    }
  }
}
