package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphAnn, Similarity}

class GraphAnnSpec extends SparkSpec {

  test("graph build: out-degree bounded by M, no self-loops") {
    val t = GraphAnn.ensureGraphIndex(spark, Sf0001, 10, 12)
    val deg = spark.table(t).groupBy("src")
      .agg(count(lit(1)).as("d")).agg(max("d")).head().getLong(0)
    assert(deg <= 12L)
    assert(spark.table(t).filter(col("src") === col("dst")).count() == 0L)
  }

  test("beam walk recalls most of the exact top-10 from a far entry") {
    val exact = Similarity.knnCosine(spark, Sf0001, 42L, 10, 2.0)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val walk = GraphAnn.beamSearch(spark, Sf0001, 42L, 0L, 10, 12, 16, 4, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // measured 8/10 on the fixture at M=12, B=16, R=4 — near-orthogonal
    // random vectors are the hard case for graph navigability, and the
    // walk still finds the neighborhood from an arbitrary entry
    assert((exact & walk).size >= 6, s"recall ${(exact & walk).size}/10")
  }

  test("wider beam and more rounds never lose recall on the fixture") {
    val exact = Similarity.knnCosine(spark, Sf0001, 42L, 10, 2.0)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val narrow = GraphAnn.beamSearch(spark, Sf0001, 42L, 0L, 10, 12, 8, 2, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val wide = GraphAnn.beamSearch(spark, Sf0001, 42L, 0L, 10, 12, 24, 6, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert((exact & wide).size >= (exact & narrow).size)
  }

  test("walk output is deterministic and ranked") {
    val a = GraphAnn.beamSearch(spark, Sf0001, 42L, 0L, 10, 12, 16, 4, 10)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist")))
    val b = GraphAnn.beamSearch(spark, Sf0001, 42L, 0L, 10, 12, 16, 4, 10)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist")))
    assert(a.sameElements(b))
    val dists = a.map(_._2)
    assert(dists.sameElements(dists.sorted))
  }
}
