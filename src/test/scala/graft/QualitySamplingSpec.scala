package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sampling, TextOps}

class QualitySamplingSpec extends SparkSpec {
  import spark.implicits._

  test("repetition stats invariants on the real corpus") {
    val rows = TextOps.repetitionStats(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_words") >= 2)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("top_count") >= 1)
      assert(r.getAs[String]("top_bigram").split(" ").length >= 2)
    }
  }

  test("repetition argmax picks the most frequent bigram, smallest on ties") {
    // run the same expression pipeline on a controlled frame by writing
    // it to a temp dir and pointing the operator at it
    val dir = java.nio.file.Files.createTempDirectory("repet").toString
    Seq(
      (1L, "a b a b a b c", "en", "s", 13L),
      (2L, "z y x w", "en", "s", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.repetitionStats(spark, dir).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("top_bigram") == "a b")
    assert(out(0).getAs[Long]("top_count") == 3L)
    assert(out(0).getAs[Long]("n_words") == 7L)
    assert(out(0).getAs[Long]("n_distinct") == 3L)
    // doc 2: every bigram occurs once -> lexicographically smallest wins
    assert(out(1).getAs[String]("top_bigram") == "x w")
    assert(out(1).getAs[Long]("top_count") == 1L)
  }

  test("stratified quota: exactly quota rows per stratum, deterministic") {
    val q = 5
    val out = Sampling.stratifiedQuota(spark, Sf0001, q)
    val perLang = out.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val total = Tables.documents(spark, Sf0001).groupBy("lang").count()
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("count"))
      .toMap
    perLang.foreach { case (lang, n) =>
      assert(n == math.min(q.toLong, total(lang)),
        s"$lang: $n vs quota $q (stratum ${total(lang)})")
    }
    // rerun is row-identical (hash order, no RNG)
    val a = out.collect().map(_.toString).toSeq
    val b = Sampling.stratifiedQuota(spark, Sf0001, q)
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("eval holdout: every stratum covered up to its size, " +
      "membership reproducible") {
    import org.apache.spark.sql.functions._
    val k = 3
    val out = Sampling.evalHoldout(spark, Sf0001, k).collect()
    assert(out.nonEmpty)
    // stratum sizes from the corpus
    val strata = Tables.documents(spark, Sf0001)
      .groupBy(col("lang"),
        length(col("n_chars").cast("string")).cast("long")
          .as("len_decade"))
      .count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = out.groupBy(r =>
      (r.getAs[String]("lang"), r.getAs[Long]("len_decade")))
      .view.mapValues(_.length).toMap
    // EVERY stratum contributes min(k, stratum size) — coverage, not
    // proportionality
    strata.foreach { case (s, n) =>
      assert(got.getOrElse(s, 0) == math.min(k.toLong, n).toInt,
        s"stratum $s: got ${got.getOrElse(s, 0)} of $n")
    }
    // ranks are 1..k and membership is a pure function of the corpus
    assert(out.forall(r => r.getAs[Long]("rk") >= 1 &&
      r.getAs[Long]("rk") <= k))
    val again = Sampling.evalHoldout(spark, Sf0001, k).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("mixWeightsTemp rejects non-integral temperatures (T=2.5) with " +
      "a clear require, on both the query and its oracle") {
    // r14 verdict #6: a dotted label (w_t2.5) silently broke col()
    // resolution, and pow(x, 1/2.5) has no JVM/libm bit-parity
    // guarantee — the contract is an explicit rejection, not a latent
    // analysis error
    val e1 = intercept[IllegalArgumentException] {
      Sampling.mixWeightsTemp(spark, Sf0001, Seq(1.0, 2.5))
    }
    assert(e1.getMessage.contains("integral temperatures"))
    val e2 = intercept[IllegalArgumentException] {
      Sampling.mixWeightsTempOracleSql(Seq(2.5))
    }
    assert(e2.getMessage.contains("integral temperatures"))
    // and the integral ladder still works
    val ok = Sampling.mixWeightsTemp(spark, Sf0001, Seq(1.0, 2.0, 5.0))
    assert(ok.columns.takeRight(3).toSeq ==
      Seq("w_t1", "w_t2", "w_t5"))
    assert(ok.count() > 0)
  }
}
