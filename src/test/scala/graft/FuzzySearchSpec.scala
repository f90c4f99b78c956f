package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzySearch

class FuzzySearchSpec extends SparkSpec {

  test("variantsOf generates the term plus every single deletion") {
    assert(FuzzySearch.variantsOf("abc").toSet ==
      Set("abc", "bc", "ac", "ab"))
    // coinciding deletions dedupe
    assert(FuzzySearch.variantsOf("aa").toSet == Set("aa", "a"))
  }

  test("delete-neighborhood expansion is complete vs brute force") {
    // ground truth: scan the whole ASCII vocabulary with levenshtein
    val vocab = spark.table(
        graft.operators.Fts.ensureIndex(spark, Sf0001))
      .filter(col("lang") === "en")
      .filter(col("term").rlike("^[a-z0-9]+$"))
      .select("term").distinct()
    for (q <- Seq("hashe", "joim", "merg")) {
      val brute = vocab
        .filter(levenshtein(lit(q), col("term")) <= 1)
        .collect().map(_.getString(0)).toSet
      val sym = FuzzySearch.expand(spark, Sf0001, Seq(q), "en", 1000000)
        .collect().map(_.getAs[String]("term")).toSet
      assert(sym == brute, s"$q: symspell $sym vs brute $brute")
    }
  }

  test("each planted typo recovers its intended vocabulary term") {
    val exp = FuzzySearch
      .expand(spark, Sf0001, Seq("hashe", "joim", "merg"), "en", 8)
      .collect()
      .groupBy(_.getAs[String]("q_term"))
      .map { case (q, rs) => q -> rs.map(_.getAs[String]("term")).toSet }
    assert(exp("hashe").contains("hash"))
    assert(exp("joim").contains("join"))
    assert(exp("merg").contains("merge"))
    // dist is exact levenshtein, never above the radius
    FuzzySearch.expand(spark, Sf0001, Seq("hashe"), "en", 8)
      .collect().foreach(r => assert(r.getAs[Int]("dist") <= 1))
  }

  test("fuzzy search of a typo'd query finds the clean query's docs") {
    val clean = graft.operators.Fts
      .search(spark, Sf0001, "hash join merge", "en", 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val fuzzy = FuzzySearch
      .fuzzySearch(spark, Sf0001, "hashe joim merg", "en", 10, 8)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // expansion may admit extra sibling terms (by design), but the
    // clean hits must be reachable: strong overlap, not disjoint sets
    assert((clean & fuzzy).size >= 5,
      s"overlap ${(clean & fuzzy).size} of ${clean.size}")
  }
}
