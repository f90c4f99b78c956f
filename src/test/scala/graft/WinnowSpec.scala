package graft

import graft.operators.TextOps

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fpsOf(texts: Seq[String]): Map[Long, Set[Long]] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    TextOps.winnowSets(df).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("fps").toSet).toMap
  }

  test("winnowing guarantee: docs sharing a long run share a fingerprint") {
    val shared = "the quick brown fox jumped over the lazy dog again"
    val fps = fpsOf(Seq(
      s"prefix one $shared suffix alpha",
      s"completely different beginning $shared other ending",
      "nothing in common with those at all whatsoever here"))
    // k+w-1 = 11 chars shared minimum; `shared` is 50 chars
    assert(fps(0L).intersect(fps(1L)).nonEmpty)
    // the unrelated doc shares nothing
    assert(fps(0L).intersect(fps(2L)).isEmpty)
  }

  test("fingerprints are deterministic and nonempty for normal docs") {
    val a = fpsOf(Seq("some reasonably long document text for hashing"))
    val b = fpsOf(Seq("some reasonably long document text for hashing"))
    assert(a == b)
    assert(a(0L).nonEmpty)
  }

  test("short documents (< k chars) have no fingerprints") {
    val fps = fpsOf(Seq("tiny"))
    assert(fps(0L).isEmpty)
  }
}

class CompressionQualitySpec extends SparkSpec {

  test("deflate ratio: repetitive text compresses far below shuffled prose; deterministic") {
    val rows = TextOps.compressionQuality(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ratio = r.getAs[Double]("compress_ratio")
      assert(ratio > 0.0 && ratio < 1.5) // deflate overhead bound
      assert(r.getAs[Long]("deflate_bytes") > 0)
    }
    // determinism: a second run yields byte-identical measurements
    val again = TextOps.compressionQuality(spark, Sf0001).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("deflate ratio separates boilerplate from diverse text") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rep = "copy paste boilerplate " * 80
    val diverse = (0 until 80)
      .map(i => s"w${i * 7919 % 9973}x${i * 104729 % 999}").mkString(" ")
    val df = Seq((0L, rep), (1L, diverse)).toDF("doc_id", "text")
    // reuse the operator body via a temp table round-trip
    val tmp = java.nio.file.Files.createTempDirectory("graft-cq").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextOps.compressionQuality(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("compress_ratio"))
      .toMap
    assert(out(0L) < out(1L) / 2,
      s"repetitive ${out(0L)} should compress far below diverse ${out(1L)}")
  }

  test("LZ-novelty estimator tracks the real codec: positive rank " +
      "correlation with zlib ratios over the corpus") {
    val zlib = TextOps.compressionQuality(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("compress_ratio")).toMap
    val est = TextOps.compressionNovelty(spark, Sf0001).collect()
      .filter(_.getAs[Long]("n_grams") > 0)
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("est_ratio"))
    assert(est.nonEmpty)
    est.foreach { case (_, r) => assert(r > 0.0 && r <= 1.0) }
    // Spearman over the shared ids
    val pairs = est.collect { case (id, e) if zlib.contains(id) =>
      (e, zlib(id)) }
    def ranks(xs: Seq[Double]): Map[Double, Double] =
      xs.sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, g) => v -> g.map(_._2).sum.toDouble / g.length }
    val (es, zs) = (pairs.map(_._1).toSeq, pairs.map(_._2).toSeq)
    val (re, rz) = (ranks(es), ranks(zs))
    val n = pairs.length.toDouble
    val mE = es.map(re).sum / n; val mZ = zs.map(rz).sum / n
    val cov = pairs.map { case (e, z) => (re(e) - mE) * (rz(z) - mZ) }.sum
    val vE = es.map(x => math.pow(re(x) - mE, 2)).sum
    val vZ = zs.map(x => math.pow(rz(x) - mZ, 2)).sum
    val rho = cov / math.sqrt(vE * vZ)
    assert(rho > 0.3,
      s"novelty estimator should rank-correlate with zlib, rho=$rho")
  }
}

class RedactPiiSpec extends SparkSpec {

  test("planted emails are counted and scrubbed; untouched docs unchanged") {
    import org.apache.spark.sql.functions._
    val rows = TextOps.redactPii(spark, Sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val expected = if (r.getAs[Long]("doc_id") % 10 == 0) 1L else 0L
      assert(r.getAs[Long]("n_emails") == expected)
    }
    // the redacted text of a planted doc differs from raw; scrub is total
    val raw = Tables.documents(spark, Sf0001)
      .filter(col("doc_id") === 0L).select("text").head().getString(0)
    val redacted = Tables.documents(spark, Sf0001)
      .filter(col("doc_id") === 0L)
      .select(regexp_replace(
        concat(col("text"), lit(" contact: user0@example.com")),
        TextOps.EmailRe, "<EMAIL>").as("r"))
      .head().getString(0)
    assert(redacted == raw + " contact: <EMAIL>")
    assert(!redacted.matches(s".*${TextOps.EmailRe}.*"))
  }
}
