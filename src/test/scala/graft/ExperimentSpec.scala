package graft

import graft.operators.{Experiment, Hybrid}

class ExperimentSpec extends SparkSpec {

  test("ab test: counts bounded by variant sizes, z matches lift sign") {
    val rows = Experiment.abTest(spark, Sf0001, 14L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("xa") <= r.getAs[Long]("na"))
      assert(r.getAs[Long]("xb") <= r.getAs[Long]("nb"))
      if (!r.isNullAt(r.fieldIndex("z"))) {
        val z = r.getAs[Double]("z")
        val lift = r.getAs[Double]("lift")
        assert(z == 0.0 && lift == 0.0 || math.signum(z) == math.signum(lift))
      }
    }
  }

  test("ab test: an impossible threshold gives zero conversions and NULL z") {
    val rows = Experiment.abTest(spark, Sf0001, 1000000L).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("xa") == 0L && r.getAs[Long]("xb") == 0L)
      assert(r.isNullAt(r.fieldIndex("z")))
    }
  }

  test("linear fusion: alpha=1 reproduces the FTS ranking head") {
    val ftsOnly = Hybrid
      .linearSearch(spark, Sf0001, "hash join merge", "en", 0L, 20, 1.0, 5)
      .collect().map(_.getAs[Long]("id")).toSeq
    val fts = graft.operators.Fts
      .search(spark, Sf0001, "hash join merge", "en", 20)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    // the top fused doc under alpha=1 is the top normalized-score FTS
    // doc (ties broken by id on both sides)
    assert(ftsOnly.head == fts.head)
    // and every alpha=1 hit came from the FTS list (knn contributes 0)
    assert(ftsOnly.toSet.subsetOf(fts.toSet))
  }

  test("linear fusion: scores in [0,1], descending, deterministic") {
    val rows = Hybrid
      .linearSearch(spark, Sf0001, "hash join merge", "en", 0L, 20, 0.6, 10)
      .collect()
    val fused = rows.map(_.getAs[Double]("fused"))
    assert(fused.forall(f => f >= 0.0 && f <= 1.0))
    assert(fused.sameElements(fused.sorted.reverse))
  }
}
