package graft

import graft.operators.MultiVector

class MultiVectorSpec extends SparkSpec {

  test("maxsim is bounded by n_qvec and ranks the query's own stripe-mates sensibly") {
    val rows = MultiVector.maxSimTopK(spark, Sf0001, 3L, 50, 500L, 10).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_qvec")
      val s = r.getAs[Long]("maxsim_micro")
      // each of the n per-query-vector maxima is a cosine in [-1, 1]
      assert(s <= n * 1000000L && s >= -n * 1000000L)
    }
    // descending, deterministic ordering
    val scores = rows.map(_.getAs[Long]("maxsim_micro"))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("pruned path returns a subset ranking consistent with exact") {
    val exact = MultiVector.maxSimTopK(spark, Sf0001, 3L, 50, 500L, 10)
      .collect().map(_.getAs[Long]("mv_doc"))
    val pruned = MultiVector.maxSimPruned(spark, Sf0001, 3L, 50, 500L, 10, 10)
      .collect().map(_.getAs[Long]("mv_doc"))
    // candidate generation may drop tail docs but the head of the
    // ranking should largely survive (measured: >= 6/10 on the fixture)
    assert((exact.toSet & pruned.toSet).size >= 6,
      s"overlap ${(exact.toSet & pruned.toSet).size}")
    // scores of docs present in both are IDENTICAL (refine is exact)
    val em = MultiVector.maxSimTopK(spark, Sf0001, 3L, 50, 500L, 10)
      .collect().map(r => r.getAs[Long]("mv_doc") ->
        r.getAs[Long]("maxsim_micro")).toMap
    MultiVector.maxSimPruned(spark, Sf0001, 3L, 50, 500L, 10, 10)
      .collect().foreach { r =>
        val d = r.getAs[Long]("mv_doc")
        em.get(d).foreach(s => assert(s == r.getAs[Long]("maxsim_micro")))
      }
  }
}
