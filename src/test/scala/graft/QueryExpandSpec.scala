package graft

import graft.operators.QueryExpand

class QueryExpandSpec extends SparkSpec {

  test("prf expansion terms exclude the originals and rank by weight") {
    val rows = QueryExpand.prfTerms(spark, Sf0001, "hash join", "en", 5, 5)
      .collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val terms = rows.map(_.getAs[String]("term"))
    assert(!terms.contains("hash") && !terms.contains("join"))
    val ws = rows.map(_.getAs[Double]("w"))
    assert(ws.sameElements(ws.sorted.reverse))
    assert(ws.forall(_ > 0.0))
  }

  test("prf retrieval keeps the AND-match head reachable (OR semantics)") {
    val strict = graft.operators.Fts
      .search(spark, Sf0001, "hash join", "en", 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val prf = QueryExpand
      .prfSearch(spark, Sf0001, "hash join", "en", 5, 5, 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // originals carry weight 1.0 vs <= 0.4 per expansion, so strict
    // hits stay competitive; require solid head overlap
    assert((strict & prf).size >= 5,
      s"overlap ${(strict & prf).size} of ${strict.size}")
  }

  test("more-like-this excludes the source doc and bounds n_shared") {
    val rows = QueryExpand.moreLikeThis(spark, Sf0001, 14L, "en", 5, 10)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") != 14L)
      val ns = r.getAs[Long]("n_shared")
      assert(ns >= 1L && ns <= 5L)
    }
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse))
  }
}
