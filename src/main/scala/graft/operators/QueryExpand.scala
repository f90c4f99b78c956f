package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalyzer

/** Query expansion — the two classic "find me more" operators every
  * search deployment layers over a term index, re-expressed
  * relationally so the whole pipeline (including the DATA-DRIVEN term
  * selection) is one declarative plan both engines replay:
  *
  *  - Pseudo-relevance feedback ([[prfSearch]]): Rocchio/RM3 lineage —
  *    retrieve top-n for the raw query, mine the feedback docs for
  *    their most characteristic terms, re-retrieve with the expanded
  *    term set (originals at full weight, expansions damped by
  *    `ExpansionWeight`). Recovers relevant docs that share vocabulary
  *    with the answer set but not with the query.
  *  - More-like-this ([[moreLikeThis]]): the Lucene/Elasticsearch MLT
  *    endpoint — a document's own top TF-IDF terms become the query,
  *    ranking its nearest neighbors in term space. The
  *    related-documents panel over the reference's corpus.
  *
  * Everything runs off the persisted inverted index
  * ([[Fts.ensureIndex]]): no second tokenization pass, and every stage
  * is a join/aggregate over (doc_id, term, tf) rows — the data-driven
  * term choices flow through joins (no driver round-trip), so the
  * oracle replays the identical selection in SQL.
  *
  * Determinism: idf = ln(N/df) over exact integers; weights and scores
  * round(…, 6); every top-n/top-m ranked with explicit tiebreaks
  * (term asc / doc_id asc).
  *
  * Scale shape: stage 1 probes the index with the driver-known original
  * terms (static bucket prune); the feedback-doc list (n rows), the
  * mined expansion terms (m rows), and the per-term weights all ride as
  * broadcast frames over index probes — a chain of small broadcasts
  * against bucket-pruned scans, never a corpus-wide shuffle. df/N stats
  * aggregate from the index (vocabulary-sized, not corpus-sized).
  */
object QueryExpand {

  /** RM3-style interpolation weight for mined expansion terms (the
    * λ-damping: originals count 1.0, expansions this much). */
  val ExpansionWeight = 0.4

  private def idxFor(spark: SparkSession, dir: String,
      lang: String): DataFrame =
    spark.table(Fts.ensureIndex(spark, dir))
      .filter(col("lang") === lit(lang))

  /** The mined expansion terms for `query`: top-`nExp` terms of the
    * top-`nFb` AND-match feedback docs, scored w = round(Σ_fb tf ·
    * ln(N/df), 6), originals excluded. Output (term, w, df, fb_tf). */
  def prfTerms(spark: SparkSession, dir: String, query: String,
      lang: String, nFb: Int, nExp: Int): DataFrame = {
    val terms = TextAnalyzer.analyze(query).distinct
    require(terms.nonEmpty, s"query '$query' analyzes to no terms")
    val idx = CacheScope.cached(idxFor(spark, dir, lang))
    // stage 1: AND-match over the original terms, Σ log(1+tf) ranking
    // (the search() formulation, off the index), top-nFb docs
    val fb = idx.filter(col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nmatch"),
        sum(log(lit(1.0) + col("tf"))).as("s"))
      .filter(col("nmatch") === lit(terms.length))
      .orderBy(round(col("s"), 6).desc, col("doc_id").asc)
      .limit(nFb)
      .select("doc_id")
    // term mining: tf mass inside the feedback docs × corpus idf.
    // df and N come from the persisted per-(lang, term) vocabulary
    // sidecar (Fts.ensureDfStats, the moreLikeThis treatment — r18):
    // the same countDistinct integers, aggregated once per corpus
    // generation instead of re-aggregating the full index per query
    val dfName = Fts.ensureDfStats(spark, dir)
    val df = spark.table(dfName)
      .filter(col("lang") === lit(lang)).select("term", "df")
    val nd = spark.table(s"${dfName}_nd")
      .filter(col("lang") === lit(lang)).select("n_docs")
    idx.join(broadcast(fb), "doc_id")
      .filter(!col("term").isin(terms: _*))
      .groupBy("term")
      .agg(sum(col("tf")).as("fb_tf"))
      .join(df, "term")
      .crossJoin(broadcast(nd))
      .select(col("term"),
        round(col("fb_tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .as("w"),
        col("df"), col("fb_tf"))
      .orderBy(col("w").desc, col("term").asc)
      .limit(nExp)
  }

  /** Driver-artifact bound for the mined expansion set: ≤ this many
    * (term, w) rows are collected between the two retrieval stages. */
  val MaxExpansions = 100

  /** Driver memo of the mined expansion rows — a pure function of
    * (corpus content, query, lang, nFb, nExp), ≤ MaxExpansions tiny
    * tuples per entry, fingerprint-checked on lookup (the fitRawMemo
    * eviction discipline) and LRU-bounded by [[DriverMemo]] so a long
    * stream of distinct queries cannot grow driver state without
    * bound (r17 verdict #2). The stage-1 mining chain (feedback top-nFb +
    * term scoring, several jobs) thereby runs once per corpus
    * generation instead of per invocation — the r16 job-floor fix for
    * fts_prf (the mining chain WAS its steady-state cost). */
  private val prfMemo = new DriverMemo[
    (String, String, String, Int, Int), Seq[(String, Double)]](256)

  private def prfTermsMemo(spark: SparkSession, dir: String,
      query: String, lang: String, nFb: Int,
      nExp: Int): Seq[(String, Double)] = {
    val fp = ScaleOps.contentHash(dir, "documents")
    prfMemo.getOrCompute((dir, query, lang, nFb, nExp), fp) {
      prfTerms(spark, dir, query, lang, nFb, nExp)
        .select(col("term"), col("w")).collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
    }
  }

  /** PRF search: stage-2 OR-retrieval over originals (weight 1.0) plus
    * the mined expansions (weight [[ExpansionWeight]] · w/max_w), score
    * Σ weight_t · log(1+tf). Output (doc_id, score) top-k.
    *
    * The mined (term, w) rows — ≤ nExp ≤ [[MaxExpansions]], the
    * graph_ann bounded-collect pattern — are collected between the
    * stages, which buys two things at once: stage 2 probes the
    * TERM-BUCKETED index with a driver-known IN-list (static bucket
    * prune, exactly like [[Fts.search]]'s original-terms probe) instead
    * of scanning the full index against a data-driven broadcast, and
    * the stage-1 mining subtree runs ONCE (the previous plan embedded
    * it twice — under max_w's broadcast and under the weight
    * projection — paying the action floor per copy). The weights are
    * still computed BY THE ENGINE from the collected raw w values
    * (same JVM arithmetic as the broadcast form), so the oracle hash is
    * unchanged. */
  def prfSearch(spark: SparkSession, dir: String, query: String,
      lang: String, nFb: Int, nExp: Int, k: Int): DataFrame = {
    require(nExp <= MaxExpansions,
      s"nExp=$nExp: the inter-stage expansion set is a driver-side " +
        s"artifact bounded by MaxExpansions=$MaxExpansions")
    val terms = TextAnalyzer.analyze(query).distinct
    val idx = CacheScope.cached(idxFor(spark, dir, lang))
    val expRows = prfTermsMemo(spark, dir, query, lang, nFb, nExp)
    import spark.implicits._
    val origW = terms.map(t => (t, 1.0)).toDF("term", "weight")
    val tw =
      if (expRows.isEmpty) origW
      else {
        val maxW = expRows.map(_._2).max
        origW.unionAll(
          expRows.toDF("term", "w")
            .select(col("term"),
              round(lit(ExpansionWeight) * col("w") / lit(maxW), 6)
                .as("weight")))
      }
    val probeTerms = terms ++ expRows.map(_._1)
    idx.filter(col("term").isin(probeTerms: _*))
      .join(broadcast(tw), "term")
      .groupBy("doc_id")
      .agg(sum(col("weight") * log(lit(1.0) + col("tf"))).as("s"))
      .select(col("doc_id"), round(col("s"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** More-like-this: the top-`nTerms` TF-IDF terms of doc `docId`
    * become the query; other docs rank by Σ idf·log(1+tf) over the
    * shared terms. Output (doc_id, n_shared, score) top-k. */
  def moreLikeThis(spark: SparkSession, dir: String, docId: Long,
      lang: String, nTerms: Int, k: Int): DataFrame = {
    val idx = CacheScope.cached(idxFor(spark, dir, lang))
    // df and the indexed-doc count come from the persisted per-lang
    // vocabulary sidecar (Fts.ensureDfStats) instead of re-aggregating
    // the full index per query (r17 verdict #7): same countDistinct
    // integers, persisted once per corpus generation, so the query
    // pays two bucketed point-scans instead of two index aggregations
    val dfName = Fts.ensureDfStats(spark, dir)
    val df = spark.table(dfName)
      .filter(col("lang") === lit(lang)).select("term", "df")
    val nd = spark.table(s"${dfName}_nd")
      .filter(col("lang") === lit(lang)).select("n_docs")
    val mlt = idx.filter(col("doc_id") === lit(docId))
      .join(df, "term")
      .crossJoin(broadcast(nd))
      .select(col("term"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .as("tfidf"),
        round(log(col("n_docs").cast("double") / col("df")), 6).as("idf"))
      .orderBy(col("tfidf").desc, col("term").asc)
      .limit(nTerms)
      .select("term", "idf")
    idx.join(broadcast(mlt), "term")
      .filter(col("doc_id") =!= lit(docId))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"),
        sum(col("idf") * log(lit(1.0) + col("tf"))).as("s"))
      .select(col("doc_id"), col("n_shared"),
        round(col("s"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  // ---- Oracle SQL (DuckDB) ---------------------------------------------

  private def idxCtes(lang: String): String =
    s"""toks AS (
       |  SELECT doc_id, ${TextAnalyzer.sqlTokenize("text")} AS term
       |  FROM documents WHERE lang = '$lang'
       |), idx AS MATERIALIZED (
       |  SELECT doc_id, term, count(*) AS tf FROM toks
       |  WHERE ${TextAnalyzer.sqlTermFilter("term")}
       |  GROUP BY doc_id, term
       |), nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM idx),
       |dfs AS MATERIALIZED (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM idx GROUP BY term
       |)""".stripMargin

  private def prfCtes(query: String, lang: String, nFb: Int,
      nExp: Int): String = {
    val terms = TextAnalyzer.analyze(query).distinct
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""${idxCtes(lang)}, fb AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, count(*) AS nmatch,
       |      round(sum(ln(1 + tf)), 6) AS s
       |    FROM idx WHERE term IN ($inList)
       |    GROUP BY doc_id) x
       |  WHERE nmatch = ${terms.length}
       |  ORDER BY s DESC, doc_id ASC LIMIT $nFb
       |), exp AS MATERIALIZED (
       |  SELECT term, w, df, fb_tf FROM (
       |    SELECT i.term,
       |      round(sum(i.tf) * ln(CAST(nd.n_docs AS DOUBLE) / dfs.df), 6)
       |        AS w,
       |      dfs.df, CAST(sum(i.tf) AS BIGINT) AS fb_tf
       |    FROM idx i JOIN fb USING (doc_id)
       |    JOIN dfs ON dfs.term = i.term, nd
       |    WHERE i.term NOT IN ($inList)
       |    GROUP BY i.term, dfs.df, nd.n_docs) y
       |  ORDER BY w DESC, term ASC LIMIT $nExp
       |)""".stripMargin
  }

  def prfTermsOracleSql(query: String, lang: String, nFb: Int,
      nExp: Int): String =
    s"""WITH ${prfCtes(query, lang, nFb, nExp)}
       |SELECT term, w, CAST(df AS BIGINT) AS df, fb_tf FROM exp
       |ORDER BY w DESC, term ASC""".stripMargin

  def prfSearchOracleSql(query: String, lang: String, nFb: Int,
      nExp: Int, k: Int): String = {
    val terms = TextAnalyzer.analyze(query).distinct
    val origRows = terms.map(t => s"('$t', 1.0)").mkString(", ")
    s"""WITH ${prfCtes(query, lang, nFb, nExp)},
       |mw AS (SELECT max(w) AS max_w FROM exp),
       |tw AS (
       |  SELECT * FROM (VALUES $origRows) v(term, weight)
       |  UNION ALL
       |  SELECT term, round($ExpansionWeight * w / max_w, 6) AS weight
       |  FROM exp, mw
       |)
       |SELECT doc_id, round(sum(weight * ln(1 + tf)), 6) AS score
       |FROM idx JOIN tw USING (term)
       |GROUP BY doc_id
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  def moreLikeThisOracleSql(docId: Long, lang: String, nTerms: Int,
      k: Int): String =
    s"""WITH ${idxCtes(lang)}, mlt AS (
       |  SELECT term, idf FROM (
       |    SELECT i.term,
       |      round(i.tf * ln(CAST(nd.n_docs AS DOUBLE) / dfs.df), 6)
       |        AS tfidf,
       |      round(ln(CAST(nd.n_docs AS DOUBLE) / dfs.df), 6) AS idf
       |    FROM idx i JOIN dfs ON dfs.term = i.term, nd
       |    WHERE i.doc_id = $docId) x
       |  ORDER BY tfidf DESC, term ASC LIMIT $nTerms
       |)
       |SELECT doc_id, count(*) AS n_shared,
       |  round(sum(idf * ln(1 + tf)), 6) AS score
       |FROM idx JOIN mlt USING (term)
       |WHERE doc_id <> $docId
       |GROUP BY doc_id
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
}
