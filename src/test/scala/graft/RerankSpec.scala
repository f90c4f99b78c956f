package graft

import graft.operators.{Fts, Similarity}

class RerankSpec extends SparkSpec {

  test("mmr: first pick is the relevance argmax; no repeats; k rows") {
    val out = Similarity.mmrRerank(spark, Sf0001, 0L, 20, 8, 0.7)
      .collect()
    assert(out.length == 8)
    val ids = out.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == ids.length)
    val byStep = out.sortBy(_.getAs[Long]("step"))
    // step 1 has the max rel of the whole output (it was the argmax of
    // the full candidate set, a superset)
    val rels = byStep.map(_.getAs[Double]("rel"))
    assert(rels.head == rels.max)
  }

  test("mmr with lambda=1 degenerates to pure relevance order") {
    val mmr = Similarity.mmrRerank(spark, Sf0001, 0L, 20, 8, 1.0)
      .collect().sortBy(_.getAs[Long]("step"))
      .map(_.getAs[Long]("vec_id")).toSeq
    val knn = Similarity.knnCosine(spark, Sf0001, 0L, 8, 2.0)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(mmr == knn)
  }

  test("mmr diversifies: lambda=0.3 output differs from pure relevance") {
    val div = Similarity.mmrRerank(spark, Sf0001, 0L, 20, 8, 0.3)
      .collect().sortBy(_.getAs[Long]("step"))
      .map(_.getAs[Long]("vec_id")).toSeq
    val pure = Similarity.mmrRerank(spark, Sf0001, 0L, 20, 8, 1.0)
      .collect().sortBy(_.getAs[Long]("step"))
      .map(_.getAs[Long]("vec_id")).toSeq
    assert(div != pure)
    assert(div.head == pure.head) // first pick is lambda-independent
  }

  test("headlines: every snippet contains a query term; window bounds hold") {
    val terms = Set("hash", "join", "merge")
    val out = Fts.headlines(spark, Sf0001, "hash join merge", "en", 10, 5)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val words = r.getAs[String]("snippet").split(" ")
      assert(words.length <= 11, s"snippet wider than 2w+1: ${words.length}")
      assert(words.exists(terms.contains),
        s"no query term in snippet: ${r.getAs[String]("snippet")}")
      assert(r.getAs[Long]("first_pos") >= 1L)
    }
  }

  test("headlines align with the search top-k (same ids, same order)") {
    val top = Fts.search(spark, Sf0001, "hash join merge", "en", 10)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    val heads = Fts.headlines(spark, Sf0001, "hash join merge", "en", 10, 5)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    // headline drops a hit only if no raw-word match exists (clean corpus:
    // none dropped)
    assert(heads == top)
  }
}
