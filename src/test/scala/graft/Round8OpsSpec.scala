package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class Round8OpsSpec extends SparkSpec {

  test("scale deciles equal exact ntile when 10 divides N") {
    val n = Tables.customer(spark, Sf0001).count()
    assert(n % 10 == 0, s"fixture premise: N=$n divisible by 10")
    val exact = Relational.customerDeciles(spark, Sf0001).collect()
      .map(_.toSeq).toSeq
    val scale = Relational.customerDecilesScale(spark, Sf0001).collect()
      .map(_.toSeq).toSeq
    assert(scale == exact)
  }

  test("lang-keyed analyzer: stopwords per language, stemmer en-only") {
    import graft.functions.TextAnalyzer
    // French function words drop under fr, survive under en
    assert(TextAnalyzer.analyzeFor("le merge et la table", "fr") ==
      Seq("merge", "table"))
    assert(TextAnalyzer.analyzeFor("le merge et la table", "en") ==
      Seq("le", "merge", "et", "la", "table"))
    // unsupported language: bare tokenization keeps English stopwords
    assert(TextAnalyzer.analyzeFor("the stream filter", "zh") ==
      Seq("the", "stream", "filter"))
    // stemmer bypass: non-en stemmed analysis is plain analysis
    assert(TextAnalyzer.analyzeStemmedFor("merging tables", "fr") ==
      TextAnalyzer.analyzeFor("merging tables", "fr"))
    assert(TextAnalyzer.analyzeStemmedFor("merging tables", "en") ==
      Seq("merg", "tabl"))
  }

  test("fr search: French stopwords reduce the query to content terms") {
    import graft.operators.Fts
    val fr = Fts.searchLang(spark, Sf0001, "le merge et la table", "fr", 10)
      .collect()
    assert(fr.nonEmpty)
    fr.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(s > 0 && s <= 1)
    }
  }

  test("scale deciles plan has no global-order row-level window") {
    val plan = Relational.customerDecilesScale(spark, Sf0001)
      .queryExecution.optimizedPlan.toString
    // every windowspec carries a partition column: the row_number is
    // bucket-partitioned and the offset window (bounded, <=10 rows)
    // keys on its non-foldable constant
    plan.split("\n").filter(_.contains("windowspecdefinition"))
      .foreach { line =>
        assert(line.contains("windowspecdefinition(_pid") ||
          line.contains("windowspecdefinition(_w"),
          s"unpartitioned window: $line")
      }
  }
}
