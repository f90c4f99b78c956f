package graft

import org.apache.spark.sql.functions._

import graft.functions.{LightStem, TextAnalyzer}
import graft.operators.Fts

class LightStemSpec extends SparkSpec {
  import spark.implicits._

  test("stemOne rule table: plural stage A") {
    assert(TextAnalyzer.stemOne("queries") == "query")
    assert(TextAnalyzer.stemOne("merges") == "merg")   // A then C
    assert(TextAnalyzer.stemOne("streams") == "stream")
    assert(TextAnalyzer.stemOne("classes") == "class") // A then C
    assert(TextAnalyzer.stemOne("class") == "class")   // -ss protected
    assert(TextAnalyzer.stemOne("status") == "status") // -us protected
    assert(TextAnalyzer.stemOne("basis") == "basis")   // -is protected
    assert(TextAnalyzer.stemOne("ies") == "ies")       // below len guard
    assert(TextAnalyzer.stemOne("gas") == "gas")       // below len guard
  }

  test("stemOne rule table: suffix stage B with undoubling") {
    assert(TextAnalyzer.stemOne("merging") == "merg")
    assert(TextAnalyzer.stemOne("running") == "run")   // nn undoubled
    assert(TextAnalyzer.stemOne("scanned") == "scan")  // nn undoubled
    assert(TextAnalyzer.stemOne("sorted") == "sort")
    assert(TextAnalyzer.stemOne("quickly") == "quick")
    assert(TextAnalyzer.stemOne("missed") == "miss")   // ss NOT undoubled
    assert(TextAnalyzer.stemOne("doing") == "doing")   // below len-6 guard
    assert(TextAnalyzer.stemOne("med") == "med")       // below len-5 guard
  }

  test("stemOne rule table: final-e stage C and inflection meets") {
    assert(TextAnalyzer.stemOne("merge") == "merg")
    assert(TextAnalyzer.stemOne("the") == "the")       // below len guard
    // inflected and base forms reduce to one stem
    assert(TextAnalyzer.stemOne("merging") == TextAnalyzer.stemOne("merge"))
    assert(TextAnalyzer.stemOne("merges") == TextAnalyzer.stemOne("merge"))
    assert(TextAnalyzer.stemOne("classes") == TextAnalyzer.stemOne("class"))
    assert(TextAnalyzer.stemOne("sorting") == TextAnalyzer.stemOne("sorted"))
  }

  test("Catalyst expression agrees with stemOne (codegen path)") {
    LightStem.register(spark)
    val words = Seq("queries", "merges", "streams", "classes", "class",
      "status", "basis", "merging", "running", "scanned", "sorted",
      "quickly", "missed", "doing", "merge", "vector", "the", "a",
      "joins", "hashing", "filtered", "batches", "es", "s", "")
    val got = words.toDF("w")
      .select(col("w"), call_function("light_stem", col("w")).as("st"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    words.foreach { w =>
      assert(got(w) == TextAnalyzer.stemOne(w), s"mismatch on '$w'")
    }
  }

  test("Catalyst expression agrees with stemOne on the whole fixture vocabulary") {
    LightStem.register(spark)
    val rows = Tables.documents(spark, Sf0001)
      .select(explode(TextAnalyzer.tokens(col("text"))).as("w"))
      .distinct()
      .select(col("w"), call_function("light_stem", col("w")).as("st"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1) == TextAnalyzer.stemOne(r.getString(0)),
        s"mismatch on '${r.getString(0)}'")
    }
  }

  test("analyzeStemmed mirrors stemmedTokens column path") {
    LightStem.register(spark)
    val text = "Merging the streams quickly; sorted hashes were scanned."
    val fromCol = Seq(text).toDF("text")
      .select(TextAnalyzer.stemmedTokens(col("text")).as("toks"))
      .head().getSeq[String](0)
    assert(fromCol == TextAnalyzer.analyzeStemmed(text))
  }

  test("stemmed search: 'merging streams' matches base forms the unstemmed search misses") {
    val stemmed = Fts.searchStemmed(spark, Sf0001, "merging streams", "en", 10)
    val hits = stemmed.collect()
    assert(hits.nonEmpty, "stemmed search found nothing")
    // the unstemmed path finds nothing: the corpus has only base forms
    val unstemmed = Fts.search(spark, Sf0001, "merging streams", "en", 10)
    assert(unstemmed.count() == 0L)
    // every hit really contains both base forms (post-analysis)
    val hitIds = hits.map(_.getLong(0)).toSeq
    val docs = Tables.documents(spark, Sf0001)
      .filter(col("doc_id").isin(hitIds: _*))
      .select(col("doc_id"), TextAnalyzer.tokens(col("text")).as("toks"))
      .collect()
    docs.foreach { r =>
      val toks = r.getSeq[String](1).toSet
      assert(toks.contains("merge") && toks.contains("stream"),
        s"doc ${r.getLong(0)} lacks a base form")
    }
  }

  test("stemmed search stays shuffle-free (plan shape)") {
    val df = Fts.searchStemmed(spark, Sf0001, "merging streams", "en", 10)
    assert(!graft.operators.ScaleOps.hasShuffleExchange(df),
      "stemmed search plan should have zero exchanges")
  }
}
