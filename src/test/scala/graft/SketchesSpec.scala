package graft

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {

  test("count-min guarantee: estimate is never below the true count") {
    val rows = Sketches.countMinEstimates(spark, Sf0001,
      Seq("hash", "join", "vector", "zz_absent_term")).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val truth = r.getAs[Long]("true_tf")
      val est = r.getAs[Long]("cm_estimate")
      assert(est >= truth,
        s"${r.getString(0)}: est $est < truth $truth")
    }
    // the absent term has zero truth but may collide to a small estimate
    val absent = rows.find(_.getString(0) == "zz_absent_term").get
    assert(absent.getAs[Long]("true_tf") == 0L)
  }

  test("sketch size is bounded by depth*width regardless of corpus") {
    val cells = Sketches.countMinCells(spark, Sf0001)
    assert(cells.count() <= Sketches.Depth * Sketches.Width)
    val total = cells.groupBy("sketch_row")
      .sum("cnt").collect().map(_.getLong(1)).toSet
    assert(total.size == 1) // every row counts the whole stream once
  }

  test("event quantiles are ordered p50 <= p95 <= p99") {
    val rows = Sketches.eventQuantiles(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p95, p99) = (r.getAs[Double]("p50"),
        r.getAs[Double]("p95"), r.getAs[Double]("p99"))
      assert(p50 <= p95 && p95 <= p99)
    }
  }
}
