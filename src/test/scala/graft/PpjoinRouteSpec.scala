package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{CacheScope, Dedup}

/** Pins the exact-threshold set-similarity join's formulation routing
  * (r15 verdict #3): the switch signal (brute pair volume Σ C(df,2)
  * over the posting index), the fixture-regime route choice, and the
  * bit-identity of the two formulations' results — the equivalence
  * that licenses runtime adaptivity (the DuckDB oracle is the brute
  * join, so one oracle gates both routes). */
class PpjoinRouteSpec extends SparkSpec {

  private val t = 0.5

  private def rows(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("volume signal is positive and routes the fixture to brute") {
    val idx = Dedup.ensurePpjoinIndex(spark, Sf0001)
    val vol = Dedup.ppjoinBruteVolume(spark, idx)
    assert(vol > 0)
    assert(vol < Dedup.PpjoinBruteMaxPairs,
      s"fixture volume $vol unexpectedly past the routing bound")
  }

  test("both formulations produce identical pairs and jaccards") {
    spark.conf.set("graft.ppjoin.route", "prefix")
    val prefix =
      try rows(Dedup.ppjoinPairs(spark, Sf0001, t))
      finally spark.conf.unset("graft.ppjoin.route")
    CacheScope.release(spark)
    spark.conf.set("graft.ppjoin.route", "brute")
    val brute =
      try rows(Dedup.ppjoinPairs(spark, Sf0001, t))
      finally spark.conf.unset("graft.ppjoin.route")
    CacheScope.release(spark)
    assert(prefix.nonEmpty)
    assert(prefix == brute)
  }

  test("default route at fixture volume is the brute formulation") {
    spark.conf.unset("graft.ppjoin.route")
    // observable route marker: the brute formulation verifies via the
    // pair-grain posting count (`inter`), never via the prefix stack's
    // array_intersect verify
    val plan = Dedup.ppjoinPairs(spark, Sf0001, t)
      .queryExecution.analyzed.toString
    assert(plan.contains("inter") && !plan.contains("array_intersect"),
      s"expected brute route, got:\n$plan")
  }
}
