package graft

import graft.operators.PcaPower

class PcaPowerSpec extends SparkSpec {

  test("top component: unit norm, positive lambda, deterministic") {
    val rows = PcaPower.topComponent(spark, Sf0001).collect()
    assert(rows.length == 64)
    val norm = math.sqrt(
      rows.map(r => math.pow(r.getAs[Double]("loading"), 2)).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"norm $norm")
    val lambdas = rows.map(_.getAs[Double]("lambda")).distinct
    assert(lambdas.length == 1 && lambdas.head > 0.0)
    // non-degenerate: the loadings are not the uniform seed
    assert(rows.map(_.getAs[Double]("loading")).distinct.length > 8)
    // deterministic across runs (no RNG anywhere in the iteration)
    graft.operators.CacheScope.release(spark)
    val again = PcaPower.topComponent(spark, Sf0001).collect()
    assert(rows.map(_.getAs[Double]("loading")).toSeq ==
      again.map(_.getAs[Double]("loading")).toSeq)
  }

  test("planted dominant direction is recovered") {
    import spark.implicits._
    val d = java.nio.file.Files
      .createTempDirectory("graft_pca_").toFile.getAbsolutePath
    // dim 3 carries 10x the variance of every other dim
    val rows = (0 until 200).map { i =>
      val base = Array.tabulate(64)(j => (((i * 31 + j * 7) % 13) - 6) / 6.0f)
      base(3) = (((i * 17) % 21) - 10) * 2.0f
      (i.toLong, base.toSeq, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val top = PcaPower.topComponent(spark, d).collect()
      .maxBy(r => math.abs(r.getAs[Double]("loading")))
    assert(top.getAs[Long]("d") == 3L, s"dominant dim ${top.get(0)}")
    graft.operators.CacheScope.release(spark)
  }
}
