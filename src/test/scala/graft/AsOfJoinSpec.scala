package graft

import org.apache.spark.sql.functions._

import graft.plans.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("custom operator agrees with the compositional as-of bit-for-bit") {
    val viaOp = operators.Relational.asofLatestOrderCustom(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    val viaComposition = operators.Relational.asofLatestOrder(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(viaOp == viaComposition)
    assert(viaOp.nonEmpty)
  }

  test("hand-built case: latest at-or-before match, nulls before first") {
    val left = Seq((1L, 5L, "e1"), (1L, 10L, "e2"), (1L, 2L, "e0"),
      (2L, 7L, "f1")).toDF("k", "t", "tag")
    val right = Seq((1L, 4L, "r4"), (1L, 10L, "r10"), (3L, 1L, "x"))
      .toDF("rk", "rt", "rtag")
    val out = AsOfJoin(left, right, "k", "t", "rk", "rt")
      .select($"tag", $"rtag").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("e0").isEmpty)          // before any right row
    assert(out("e1").contains("r4"))   // 4 <= 5 < 10
    assert(out("e2").contains("r10"))  // equal timestamp matches (<=)
    assert(out("f1").isEmpty)          // no right rows for key 2
  }

  test("NULL keys never match (SQL semantics, not null==null)") {
    val left = Seq((Some(1L), 5L, "e1"), (None, 10L, "eNull"))
      .toDF("k", "t", "tag")
    val right = Seq((Some(1L), 4L, "r4"), (None, 1L, "rNull"))
      .toDF("rk", "rt", "rtag")
    val out = AsOfJoin(left, right, "k", "t", "rk", "rt")
      .select($"tag", $"rtag").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("e1").contains("r4"))
    assert(out("eNull").isEmpty) // NULL key joins nothing
  }

  test("self-join without aliasing is rejected (duplicate attributes)") {
    val df = Seq((1L, 2L)).toDF("k", "t")
    intercept[IllegalArgumentException] {
      AsOfJoin(df, df, "k", "t", "k", "t")
    }
  }

  test("planner inserts exchanges and sorts from declared requirements") {
    val left = spark.range(100).select($"id".as("k"), ($"id" * 2).as("t"))
    val right = spark.range(50).select($"id".as("rk"), ($"id" * 3).as("rt"))
    val joined = AsOfJoin(left, right, "k", "t", "rk", "rt")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin")) // node renders without Exec suffix
    assert(plan.contains("Sort")) // EnsureRequirements satisfied ordering
    assert(joined.count() == 100) // left join preserves all left rows
  }
}
