package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quantize, Similarity}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("codes are bounded to [-127,127] and the max-abs element saturates") {
    val c = Quantize.codes(Tables.embeddings(spark, Sf0001)).collect()
    assert(c.nonEmpty)
    c.foreach { r =>
      val codes = r.getSeq[Int](r.fieldIndex("codes"))
      assert(codes.forall(x => x >= -127 && x <= 127))
      // the element with max |v_i| maps to exactly +-127
      assert(codes.exists(x => math.abs(x) == 127))
    }
  }

  test("quantization round-trips known vectors exactly") {
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f), 1),
      (2L, Array(0.0f, 0.0f, 2.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Quantize.codes(df).orderBy("vec_id").collect()
    assert(out(0).getSeq[Int](out(0).fieldIndex("codes")) == Seq(127, -63, 32))
    assert(out(0).getAs[Double]("scale") == 1.0)
    assert(out(1).getSeq[Int](out(1).fieldIndex("codes")) == Seq(0, 0, 127))
  }

  test("all-zero vectors quantize to zero codes, not NaN") {
    val df = Seq((1L, Array(0.0f, 0.0f), 1)).toDF("vec_id", "embedding", "label")
    val out = Quantize.codes(df).collect()(0)
    assert(out.getSeq[Int](out.fieldIndex("codes")) == Seq(0, 0))
  }

  test("quantized KNN approximates exact KNN (top-10 overlap >= 8)") {
    val exact = Similarity.knnCosine(spark, Sf0001, 0L, 10, 2.0)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val quant = Quantize.knnQuantized(spark, Sf0001, 0L, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert((exact & quant).size >= 8,
      s"overlap ${(exact & quant).size} of 10")
  }

  test("matryoshka two-stage equals exact KNN when candidates cover the corpus") {
    // with nCand >= corpus size the re-rank stage IS exact KNN
    val exact = Similarity.knnCosine(spark, Sf0001, 0L, 10, 2.0)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist")))
    val mat = Similarity.knnMatryoshka(spark, Sf0001, 0L, 16, 100000, 10)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist")))
    assert(mat.sameElements(exact))
  }

  test("matryoshka coarse stage bounds work: candidate count respected, recall reasonable") {
    val exact = Similarity.knnCosine(spark, Sf0001, 0L, 10, 2.0)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val mat = Similarity.knnMatryoshka(spark, Sf0001, 0L, 16, 50, 10)
      .collect()
    assert(mat.length == 10)
    val hits = mat.map(_.getAs[Long]("vec_id")).toSet
    // the synthetic embeddings are random — no MRL training concentrates
    // signal in the prefix dims — so coarse-stage recall is inherently
    // modest here; exactness of the two-stage SEMANTICS is pinned by the
    // nCand>=corpus test above and the DuckDB oracle
    assert((exact & hits).size >= 2, s"recall ${(exact & hits).size}/10")
    // coarse distance is over a prefix: full distance generally differs
    mat.foreach(r => assert(!r.isNullAt(r.fieldIndex("dist"))))
  }

  test("quant_recall frame: n_exact = k, micro fields consistent, and " +
      "mat recall with a corpus-covering pool is exactly 1.0") {
    val qids = Seq(3L, 7L)
    val k = 5
    val out = Quantize.quantRecall(spark, Sf0001, qids, 16, 40, k)
      .collect()
    assert(out.map(_.getAs[Long]("q_id")).toSeq == qids.sorted)
    out.foreach { r =>
      assert(r.getAs[Long]("n_exact") == k)
      Seq("sq", "mat").foreach { p =>
        val c = r.getAs[Long](s"${p}_common")
        val m = r.getAs[Long](s"${p}_micro")
        assert(c >= 0L && c <= k)
        assert(m == c * 1000000L / k)
      }
    }
    // a pool covering the whole corpus makes the refined ranking the
    // exact ranking — mat recall must be exactly 1.0 per query
    val full = Quantize.quantRecall(spark, Sf0001, qids, 16, 100000, k)
      .collect()
    full.foreach(r => assert(r.getAs[Long]("mat_common") == k))
  }
}
