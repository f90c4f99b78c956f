package graft

import graft.sources.JsonlStore

class JsonlStoreSpec extends SparkSpec {
  import spark.implicits._

  test("JSONL round-trips rows exactly, including hostile strings") {
    val rows = Seq(
      (1L, "plain text", "en", "s1", 10L),
      (2L, "line\nbreak and \"quotes\" and a\ttab", "en", "s2", 31L),
      (3L, "unicode: café 中文 😀", "zh", "s3", 12L),
      (4L, "backslash \\ and / slash and {json} [chars]", "fr", "s4", 42L),
      (5L, "", "en", "s5", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_jsonl_spec_").toFile.getAbsolutePath
    try {
      JsonlStore.write(rows, s"$tmp/d")
      val back = JsonlStore.read(spark, rows.schema, s"$tmp/d")
      val a = rows.collect().map(_.toSeq).sortBy(_.head.toString)
      val b = back.collect().map(_.toSeq).sortBy(_.head.toString)
      assert(a.length == b.length)
      a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
    } finally {
      graft.sources.ParquetStore.deleteRecursively(
        java.nio.file.Paths.get(tmp))
    }
  }

  test("round-trip digest groups all fixture languages") {
    val langs = JsonlStore.roundTripDigest(spark, Sf0001)
      .collect().map(_.getAs[String]("lang"))
    assert(langs.nonEmpty && langs.sameElements(langs.sorted))
  }
}
