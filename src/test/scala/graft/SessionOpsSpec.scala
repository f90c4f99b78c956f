package graft

import graft.operators.{EventMining, Relational, Sampling}

/** Invariant checks for the round-11 continuation operators — the
  * semantic properties the DuckDB hash gate can't articulate (it only
  * proves engine parity, not that the shared definition is sane). */
class SessionOpsSpec extends SparkSpec {

  test("agg_share: shares partition the total") {
    val rows = Relational.revenueShareByNation(spark, Sf0001).collect()
    val total = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(total - 1.0) < 1e-4, s"shares sum to $total")
    assert(rows.forall(_.getAs[Double]("share") > 0.0))
  }

  test("pareto: cumulative share is monotone and past_80 is a suffix") {
    val rows = Relational.paretoSuppliers(spark, Sf0001, 25).collect()
      .sortBy(_.getAs[Long]("rank"))
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a - 1e-9 })
    assert(cums.forall(c => c > 0 && c <= 1.0 + 1e-9))
    val flags = rows.map(_.getAs[Long]("past_80"))
    assert(flags.zip(flags.tail).forall { case (a, b) => b >= a },
      "past_80 must be a suffix property of the ranking")
  }

  test("customer_rfm: quartiles in range, segment counts partition") {
    val rows = Relational.customerRfm(spark, Sf0001).collect()
    rows.foreach { r =>
      Seq("r_q", "f_q", "m_q").foreach { c =>
        val v = r.getAs[Long](c); assert(v >= 1 && v <= 4, s"$c=$v")
      }
    }
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    val custs = spark.read.parquet(s"$Sf0001/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(total == custs)
  }

  test("orders_monthly: YoY defined exactly when the prior year exists") {
    val rows = Relational.monthlyOrders(spark, Sf0001).collect()
    val months = rows.map(_.getAs[Long]("ym")).toSet
    rows.foreach { r =>
      val ym = r.getAs[Long]("ym")
      val hasPrev = months.contains(ym - 100)
      assert(r.isNullAt(r.fieldIndex("yoy_growth")) != hasPrev,
        s"ym $ym growth-null mismatch")
    }
  }

  test("mix drift: halves partition the event count, shares sum to 1") {
    val rows = EventMining.typeMixDrift(spark, Sf0001).collect()
    val n = rows.map(r => r.getAs[Long]("n1") + r.getAs[Long]("n2")).sum
    val events = spark.read.parquet(s"$Sf0001/events.parquet").count()
    assert(n == events)
    Seq("share1", "share2").foreach { c =>
      val s = rows.map(_.getAs[Double](c)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$c sums to $s")
    }
    rows.foreach(r => assert(r.getAs[Double]("chi2_contrib") >= 0.0))
  }

  test("A-ES sample: exact size, keys in (0,1], weight bias present") {
    val rows = Sampling.aesSample(spark, Sf0001, 20).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val k = r.getAs[Double]("aes_key")
      assert(k > 0.0 && k <= 1.0, s"key $k")
    }
    // weight-proportional: the sampled mean length should exceed the
    // corpus mean (long docs draw keys nearer 1)
    val sampled = rows.map(_.getAs[Long]("n_chars").toDouble).sum / 20
    val corpus = spark.read.parquet(s"$Sf0001/documents.parquet")
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head.getDouble(0)
    assert(sampled > corpus, s"sampled mean $sampled <= corpus $corpus")
  }

  test("part_price_cv: cv non-negative and ordering is by cv") {
    val rows = Relational.partPriceCv(spark, Sf0001, 20).collect()
    val cvs = rows.map(_.getAs[Double]("cv"))
    assert(cvs.forall(_ >= 0.0))
    assert(cvs.zip(cvs.tail).forall { case (a, b) => a >= b - 1e-9 })
  }
}
