package graft

import graft.operators.Drift

class DriftSpec extends SparkSpec {

  test("psi: buckets partition the corpus; identical halves score ~0") {
    val rows = Drift.psi(spark, Sf0001, 10).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val total = rows.map(r =>
      r.getAs[Long]("n_ref") + r.getAs[Long]("n_new")).sum
    val docs = spark.read
      .parquet(s"$Sf0001/documents.parquet").count()
    assert(total == docs)
    // even/odd halves of one uniform synthetic corpus: PSI far below
    // the 0.1 "stable" monitoring threshold
    val psi = rows.map(_.getAs[Double]("psi_contrib")).sum
    assert(psi >= 0.0 && psi < 0.1, s"psi $psi")
  }

  test("psi detects a planted shift") {
    import spark.implicits._
    val d = java.nio.file.Files
      .createTempDirectory("graft_drift_").toFile.getAbsolutePath
    // even ids short, odd ids long -> heavy mass shift across buckets
    (0L until 400L).map(i =>
      (i, "x", "en", "s", if (i % 2 == 0) 10L + (i % 5) else 900L + (i % 5)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val psi = Drift.psi(spark, d, 10).collect()
      .map(_.getAs[Double]("psi_contrib")).sum
    assert(psi > 0.25, s"psi $psi should flag a full shift")
  }
}
