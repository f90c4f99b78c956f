package graft

import org.apache.spark.sql.functions._

import graft.operators.{ProductQuant, Similarity}

class ProductQuantSpec extends SparkSpec {

  test("encode: M codes per vector, all within [0, NCode)") {
    val enc = ProductQuant.encode(spark, Sf0001).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val codes = r.getSeq[Int](r.fieldIndex("codes"))
      assert(codes.length == ProductQuant.M)
      assert(codes.forall(c => c >= 0 && c < ProductQuant.NCode))
    }
  }

  /** Integer micro-unit quantization of every embedding, via the same
    * column expression the operator uses (no driver-side rounding). */
  private def microVectors(): Map[Long, Array[Long]] =
    Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1e6).cast("long")).as("qi"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

  private def subDist(v: Array[Long], cw: Array[Long], s: Int): Long =
    (0 until ProductQuant.Dsub).map { sd =>
      val d = v(s * ProductQuant.Dsub + sd) - cw(sd); d * d
    }.sum

  test("trained codebook: full shape; encode picks the argmin codeword " +
      "with lower-id tiebreak") {
    val cb = ProductQuant.loadCodebook(spark, Sf0001)
    assert(cb.length == ProductQuant.M &&
      cb.forall(_.length == ProductQuant.NCode) &&
      cb.flatten.forall(_.length == ProductQuant.Dsub))
    val vecs = microVectors()
    val enc = ProductQuant.encode(spark, Sf0001).collect()
    enc.foreach { r =>
      val v = vecs(r.getAs[Long]("vec_id"))
      val codes = r.getSeq[Int](r.fieldIndex("codes"))
      (0 until ProductQuant.M).foreach { s =>
        val dists = (0 until ProductQuant.NCode)
          .map(c => subDist(v, cb(s)(c), s))
        val best = dists.indexOf(dists.min) // indexOf = lowest id wins
        assert(codes(s) == best,
          s"vec ${r.getAs[Long]("vec_id")} s=$s: ${codes(s)} != $best")
      }
    }
  }

  test("Lloyd training does not increase total quantization error vs " +
      "the untrained seed-slice codebook") {
    val vecs = microVectors()
    val cb = ProductQuant.loadCodebook(spark, Sf0001)
    // untrained baseline: codewords = subspace slices of the same NCode
    // hash-spread seed vectors the training starts from
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seedIds = vecs.keys.toSeq
      .sortBy(id => (md5hex(id.toString), id))
      .take(ProductQuant.NCode)
    val cb0 = Array.tabulate(ProductQuant.M, ProductQuant.NCode) {
      (s, c) =>
        vecs(seedIds(c)).slice(s * ProductQuant.Dsub,
          (s + 1) * ProductQuant.Dsub)
    }
    def totalErr(book: Array[Array[Array[Long]]]): BigInt =
      vecs.values.map { v =>
        (0 until ProductQuant.M).map { s =>
          BigInt((0 until ProductQuant.NCode)
            .map(c => subDist(v, book(s)(c), s)).min)
        }.sum
      }.sum
    val trained = totalErr(cb)
    val untrained = totalErr(cb0)
    assert(trained <= untrained,
      s"trained err $trained > untrained $untrained")
  }

  test("pq table persists once and is reused") {
    val n1 = ProductQuant.ensurePqTable(spark, Sf0001)
    val n2 = ProductQuant.ensurePqTable(spark, Sf0001)
    assert(n1 == n2 && spark.catalog.tableExists(n1))
    assert(spark.table(n1).count() ==
      Tables.embeddings(spark, Sf0001).count())
  }

  test("ADC approximates L2: refine stage orders by exact distance, recall reasonable") {
    val out = ProductQuant.pqScan(spark, Sf0001, 7L, 50, 10).collect()
    assert(out.length == 10)
    val dists = out.map(_.getAs[Double]("dist"))
    assert(dists.sameElements(dists.sorted))
    assert(!out.map(_.getAs[Long]("vec_id")).contains(7L))
    // exact L2 top-10 via the cosine path's vectors: compute directly
    val emb = Tables.embeddings(spark, Sf0001)
    val q = emb.filter(col("vec_id") === 7L)
      .select(col("embedding").as("qv"))
    val exact = emb.filter(col("vec_id") =!= 7L)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        aggregate(
          zip_with(col("embedding"), col("qv"),
            (x, y) => (x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double"))),
          lit(0.0), (a, x) => a + x).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(10).collect().map(_.getAs[Long]("vec_id")).toSet
    val got = out.map(_.getAs[Long]("vec_id")).toSet
    // random (untrained-codebook) corpus: expect partial but real recall
    assert((exact & got).size >= 3, s"recall ${(exact & got).size}/10")
  }
}
