package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._

import graft.functions.CoverDensityScore
import graft.operators.Fts

class CoverDensitySpec extends SparkSpec {
  import spark.implicits._

  private def score(lists: Seq[Seq[Int]]): Double =
    CoverDensityScore.score(ArrayData.toArrayData(
      lists.map(l => ArrayData.toArrayData(l.toArray)).toArray))

  test("hand-computed covers") {
    // adjacent pair: one cover of width 2 -> s = 2/2 = 1 -> 1/(1+1)
    assert(math.abs(score(Seq(Seq(0), Seq(1))) - 0.5) < 1e-12)
    // second occurrence far away adds a wide cover: s = 1 + 2/10
    val s2 = 1.0 + 2.0 / 10
    assert(math.abs(score(Seq(Seq(0, 10), Seq(1))) - s2 / (1 + s2)) < 1e-12)
    // single term: each occurrence is a width-1 cover
    assert(math.abs(score(Seq(Seq(3, 7, 9))) - 3.0 / 4.0) < 1e-12)
  }

  test("missing term means no cover (AND semantics)") {
    assert(score(Seq(Seq(1, 2), Seq())) == 0.0)
    assert(score(Seq()) == 0.0)
  }

  test("proximity dominates: tight phrase beats scattered repeats") {
    val tight = score(Seq(Seq(5), Seq(6)))        // width-2 cover
    val scattered = score(Seq(Seq(0), Seq(50)))   // width-51 cover
    assert(tight > scattered)
  }

  test("expression evaluates identically under codegen (DataFrame path)") {
    CoverDensityScore.register(spark)
    val df = Seq(
      (1L, Seq(Seq(0), Seq(1))),
      (2L, Seq(Seq(0, 10), Seq(1))),
      (3L, Seq(Seq(1, 2), Seq.empty[Int]))
    ).toDF("id", "pos_arrays")
    val got = df.select($"id", expr("cover_density_score(pos_arrays)").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - score(Seq(Seq(0), Seq(1)))) < 1e-12)
    assert(math.abs(got(2L) - score(Seq(Seq(0, 10), Seq(1)))) < 1e-12)
    assert(got(3L) == 0.0)
  }

  test("cover-density search ranks a tight phrase above scattered terms") {
    val hits = Fts.searchCoverDensity(
      spark, Sf0001, "hash join", "en", 10).collect()
    assert(hits.nonEmpty)
    val scores = hits.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-(_: Double))))
    scores.foreach(s => assert(s > 0 && s < 1))
  }
}
