package graft

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {

  test("hll estimate lands within 3 standard errors of the exact count") {
    // standard error for m=256 registers is 1.04/sqrt(256) = 6.5%
    val rows = Sketches.hllVsExact(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val est = r.getAs[Double]("hll_estimate")
      assert(math.abs(est - exact) / exact <= 3 * 1.04 / 16.0,
        s"estimate $est too far from exact $exact")
    }
  }

  test("hll registers merge by MAX: two half-corpus sketches equal the full sketch") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, Sf0001)
    def regsOf(df: org.apache.spark.sql.DataFrame) = {
      // same register/rank derivation as hllEstimate, via a temp view
      df.createOrReplaceTempView("hll_merge_probe")
      spark.sql("""
        SELECT event_type,
          CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 2), 16, 10) AS INT) AS reg,
          max(CASE WHEN length(regexp_extract(substr(md5(CAST(user_id AS STRING)), 3, 12), '^(0*)', 1)) = 12
            THEN 49
            ELSE length(regexp_extract(substr(md5(CAST(user_id AS STRING)), 3, 12), '^(0*)', 1)) * 4 +
              CASE substr(substr(md5(CAST(user_id AS STRING)), 3, 12),
                     length(regexp_extract(substr(md5(CAST(user_id AS STRING)), 3, 12), '^(0*)', 1)) + 1, 1)
                WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
                ELSE 0 END + 1
          END) AS mx
        FROM hll_merge_probe GROUP BY event_type, reg""")
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    }
    val full = regsOf(ev)
    val left = regsOf(ev.filter(col("event_id") % 2 === 0))
    val right = regsOf(ev.filter(col("event_id") % 2 === 1))
    val merged = (left.keySet ++ right.keySet).map { k =>
      k -> math.max(left.getOrElse(k, 0), right.getOrElse(k, 0))
    }.toMap
    assert(merged == full) // register-wise MAX is lossless sharding
  }

  test("bloom guarantee: no false negatives, ever") {
    val rows = Sketches.bloomMembership(spark, Sf0001,
      Seq(0L, 5L, 42L, 777777L, 31337L)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.getAs[Boolean]("truth_member"))
        assert(r.getAs[Boolean]("bloom_member"),
          s"false negative for probe ${r.getAs[Long]("probe_id")}")
    }
  }

  test("hash sampling is deterministic and shard-consistent") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, Sf0001)
    val keep = graft.operators.Sampling.hashKeep(col("doc_id"), 0.2)
    val full = docs.filter(keep)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // same predicate over any partitioning of the data → same sample
    val repartitioned = docs.repartition(17).filter(keep)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(full == repartitioned)
    // samples of shards union to the sample of the union
    val even = docs.filter(col("doc_id") % 2 === 0).filter(keep)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val odd = docs.filter(col("doc_id") % 2 === 1).filter(keep)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((even ++ odd) == full)
    // rate is roughly honored (hash uniformity)
    val n = docs.count().toDouble
    assert(full.size > 0.1 * n && full.size < 0.3 * n)
  }

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
