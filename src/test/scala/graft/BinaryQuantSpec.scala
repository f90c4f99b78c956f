package graft

import org.apache.spark.sql.functions._

import graft.operators.{BinaryQuant, Similarity}

class BinaryQuantSpec extends SparkSpec {
  import spark.implicits._

  test("sign packing sets exactly the strictly-positive bits") {
    // dims 0..63: positive where i % 3 == 0, zero where i % 3 == 1
    // (zero is NOT positive), negative otherwise
    val v = Array.tabulate(64) { i =>
      if (i % 3 == 0) 1.5f else if (i % 3 == 1) 0.0f else -2.0f
    }
    val df = Seq((1L, v, 1)).toDF("vec_id", "embedding", "label")
    val r = BinaryQuant.codes(df).collect()(0)
    val expW0 = (0 until 32).map(i => if (i % 3 == 0) 1L << i else 0L).sum
    val expW1 = (0 until 32).map(i => if ((i + 32) % 3 == 0) 1L << i else 0L).sum
    assert(r.getAs[Long]("w0") == expW0)
    assert(r.getAs[Long]("w1") == expW1)
  }

  test("bq refine equals exact KNN when nCand covers the corpus") {
    val exact = Similarity.knnCosine(spark, Sf0001, 7L, 10, 2.0)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist")))
    val bq = BinaryQuant.bqScan(spark, Sf0001, 7L, 100000, 10)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist")))
    assert(bq.sameElements(exact))
  }

  test("bq scan with bounded nCand keeps most of the exact top-10") {
    // measured on the fixture: asym cand@50 covers 9/10 of the exact
    // top-10 for qid=7 (symmetric Hamming covers only ~6)
    val exact = Similarity.knnCosine(spark, Sf0001, 7L, 10, 2.0)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val bq = BinaryQuant.bqScan(spark, Sf0001, 7L, 50, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert((exact & bq).size >= 7, s"overlap ${(exact & bq).size} of 10")
  }

  test("recall gate: bounded, and the asymmetric ranking dominates") {
    val rows = BinaryQuant.bqRecall(spark, Sf0001, Seq(0L, 7L, 19L), 10)
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      Seq("sym_micro", "asym_micro").foreach { c =>
        val rm = r.getAs[Long](c)
        assert(rm >= 0L && rm <= 1000000L)
      }
      assert(r.getAs[Long]("n_exact") == 10L)
    }
    // the asymmetric estimator is WHY the serving path keeps the query
    // full-precision: measured 0.13 sym vs 0.33 asym on these qids
    val symMean = rows.map(_.getAs[Long]("sym_micro")).sum / rows.length
    val asymMean = rows.map(_.getAs[Long]("asym_micro")).sum / rows.length
    assert(asymMean > symMean,
      s"asym $asymMean should beat sym $symMean")
    assert(asymMean >= 200000L, s"mean asym_micro $asymMean")
  }

  test("hamming is symmetric and zero on self") {
    val c = BinaryQuant.codes(Tables.embeddings(spark, Sf0001))
      .limit(2).collect()
    val (a0, a1) = (c(0).getAs[Long]("w0"), c(0).getAs[Long]("w1"))
    val (b0, b1) = (c(1).getAs[Long]("w0"), c(1).getAs[Long]("w1"))
    def ham(x0: Long, x1: Long, y0: Long, y1: Long): Int =
      java.lang.Long.bitCount(x0 ^ y0) + java.lang.Long.bitCount(x1 ^ y1)
    assert(ham(a0, a1, a0, a1) == 0)
    assert(ham(a0, a1, b0, b1) == ham(b0, b1, a0, a1))
    assert(ham(a0, a1, b0, b1) <= 64)
  }
}
