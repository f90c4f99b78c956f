package graft

import java.nio.file.{Files, Paths}

import graft.sources.JsonDocs

class JsonDocsSpec extends SparkSpec {

  private def writeLines(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("jsonl").toString
    Files.writeString(Paths.get(s"$dir/docs.jsonl"),
      lines.mkString("\n"))
    s"$dir/docs.jsonl"
  }

  test("valid lines parse with schema; metadata map preserved") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s1", "metadata": {"k": "v"}}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s2"}"""))
    val docs = JsonDocs.readValid(spark, path).collect()
    assert(docs.length == 2)
    val d1 = docs.find(_.getLong(0) == 1L).get
    assert(d1.getAs[String]("text") == "hello world")
    assert(d1.getAs[Map[String, String]]("metadata") == Map("k" -> "v"))
  }

  test("malformed lines go to the corrupt side-channel, not the batch") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s"}""",
      """{not json at all""",
      """{"doc_id": 3, "text": "also ok", "lang": "en", "source": "s"}"""))
    assert(JsonDocs.readValid(spark, path).count() == 2)
    val corrupt = JsonDocs.readCorrupt(spark, path).collect()
    assert(corrupt.length == 1)
    assert(corrupt.head.getString(0).startsWith("{not json"))
  }

  test("parquet documents round-trip through JSONL losslessly") {
    val dir = Files.createTempDirectory("jsonl_rt").toString + "/out"
    val original = Tables.documents(spark, Sf0001)
    JsonDocs.write(original, dir)
    val back = JsonDocs.readValid(spark, s"$dir/part-*")
      .select("doc_id", "text", "lang", "source")
    val origKeyed = original.select("doc_id", "text", "lang", "source")
    assert(back.count() == origKeyed.count())
    assert(back.exceptAll(origKeyed).count() == 0)
  }
}
