package graft

import graft.functions.ChunkDocument
import graft.operators.Chunker

class ChunkGeneratorSpec extends SparkSpec {
  import spark.implicits._

  test("generator output is bit-identical to the typed flatMap path") {
    ChunkDocument.register(spark)
    Tables.documents(spark, Sf0001).createOrReplaceTempView("docs_gen")
    val viaSql = spark.sql(
      """SELECT doc_id, c.chunk_index, c.start_char, c.end_char,
        |       c.chunk_size, c.content
        |FROM docs_gen
        |LATERAL VIEW chunk_document(text, 100, 20) c
        |ORDER BY doc_id, chunk_index""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4), r.getString(5))).toSeq
    val viaFlatMap = Chunker.chunkDocuments(spark, Sf0001, 100, 20)
      .orderBy("doc_id", "chunk_index")
      .collect().map(c => (c.doc_id, c.chunk_index, c.start_char,
        c.end_char, c.chunk_size, c.content)).toSeq
    assert(viaSql == viaFlatMap)
    assert(viaSql.nonEmpty)
  }

  test("generator works in the select clause (DSL composition)") {
    ChunkDocument.register(spark)
    val n = Seq((1L, "alpha beta " * 30)).toDF("id", "text")
      .selectExpr("id", "chunk_document(text, 50, 10)")
    assert(n.count() > 1)
    assert(n.columns.toSeq ==
      Seq("id", "chunk_index", "start_char", "end_char", "chunk_size",
        "is_first_chunk", "is_last_chunk", "content"))
  }

  test("null and empty text generate no rows") {
    ChunkDocument.register(spark)
    val out = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "ok"))
      .toDF("id", "text")
      .selectExpr("id", "chunk_document(text, 50, 10)")
    assert(out.select("id").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }
}
