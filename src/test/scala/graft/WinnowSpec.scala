package graft

import graft.operators.TextOps

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fpsOf(texts: Seq[String]): Map[Long, Set[String]] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    TextOps.winnowSets(df).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[String]]("fps").toSet).toMap
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
