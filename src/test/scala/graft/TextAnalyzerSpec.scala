package graft

import org.apache.spark.sql.functions.col

import graft.functions.TextAnalyzer

class TextAnalyzerSpec extends SparkSpec {
  import spark.implicits._

  test("scala analyzer: lowercase, split, minlen, stopwords") {
    assert(TextAnalyzer.analyze("The QUICK brown-fox, and a dog!") ==
      Seq("quick", "brown", "fox", "dog"))
    assert(TextAnalyzer.analyze("") == Nil)
    assert(TextAnalyzer.analyze("a I x") == Nil) // all shorter than 2
    assert(TextAnalyzer.analyze("the and or of") == Nil) // all stopwords
  }

  test("column analyzer matches scala analyzer on arbitrary text") {
    val samples = Seq(
      "The QUICK brown-fox, and a dog!",
      "hash join merge sort",
      "", "   ", "a b c d", "The THE the",
      "punctuation;everywhere:here!and?there",
      "unicode café straße 中文 words")
    val fromCol = samples.toDF("text")
      .select(TextAnalyzer.tokens(col("text")).as("toks"))
      .collect().map(_.getSeq[String](0).toList)
    val fromScala = samples.map(TextAnalyzer.analyze(_).toList)
    assert(fromCol.toSeq == fromScala)
  }

  test("analyzer drops tokens shorter than MinTokenLen") {
    assert(!TextAnalyzer.analyze("x yy zzz").contains("x"))
    assert(TextAnalyzer.analyze("x yy zzz") == Seq("yy", "zzz"))
  }
}
