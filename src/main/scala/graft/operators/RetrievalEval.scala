package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.TextAnalyzer

/** Retrieval-quality self-evaluation: nDCG@k and MRR@k of the engine's
  * BM25 ranking against a deterministic graded-relevance label
  * (grade = number of distinct query terms present in the doc, the
  * standard term-overlap proxy when no human judgments exist — the
  * eval loop a training-data pipeline runs after every index change,
  * mirroring ann_recall / pq_recall for the vector side).
  *
  * Determinism contract: every per-position DCG contribution is rounded
  * to integer MICRO units BEFORE summing — integer sums are
  * order-independent, so the Spark fold and the DuckDB oracle agree
  * bit-for-bit (same trick as annRecall's recall_micro).
  *
  * Scale shape: the scored frame is one scan-local pass + a 1-row
  * broadcast (see Fts.bm25Scored); the engine ranking is a
  * TakeOrderedAndProject top-k (bounded collect of k ≤ 10 rows,
  * driver-side DCG fold documented like Hybrid's RRF); the ideal
  * ranking needs only the grade HISTOGRAM (≤ n_query_terms + 1 rows),
  * never a global sort — at 100 TB this is a full scan, a top-k, and a
  * tiny aggregate.
  */
object RetrievalEval {

  private def dcgMicro(grades: Seq[Int]): Long =
    grades.zipWithIndex.map { case (g, i) =>
      // pos is 1-based; log2(pos + 1) via ln
      math.round((math.pow(2.0, g) - 1.0) /
        (math.log(i + 2.0) / math.log(2.0)) * 1e6)
    }.sum

  def ndcg(spark: SparkSession, dir: String, query: String, lang: String,
      k: Int): DataFrame = {
    val nTerms = TextAnalyzer.analyze(query).distinct.length
    // cached: the scored frame feeds BOTH bounded collects below (the
    // top-k and the grade histogram) — uncached, each re-ran the whole
    // corpus tokenize+score subtree (r16 job-floor fix). ROUTED like
    // fts_bm25 (r17): past the corpus-size threshold the scored frame
    // is the index probe, so the retrieval eval never re-tokenizes the
    // corpus either — the two routes are bit-identical (FtsRouteSpec),
    // so the eval's numbers don't depend on the route taken.
    val scored = CacheScope.cached(
      if (Fts.routeToIndex(spark, dir))
        Fts.bm25ScoredIndexed(spark, dir, query, lang)
      else Fts.bm25Scored(spark, dir, query, lang))

    // engine ranking: bounded top-k collect (k ≤ 10, same regime as
    // Hybrid's RRF rank fold — documented driver-side bound)
    val top = scored
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("grade"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq

    // ideal ranking from the grade histogram: ≤ nTerms + 1 rows
    val hist = scored.groupBy(col("grade")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(-_._1)
    val idealGrades = hist.iterator
      .flatMap { case (g, n) => Iterator.fill(math.min(n, k).toInt)(g) }
      .take(k).toSeq

    val dcg = dcgMicro(top.map(_._2))
    val idcg = dcgMicro(idealGrades)
    val ndcgMicro = if (idcg == 0) 0L else dcg * 1000000L / idcg
    // MRR@k: reciprocal rank of the first fully-matching doc
    val mrrMicro = top.zipWithIndex
      .collectFirst { case ((_, g), i) if g == nTerms =>
        math.round(1e6 / (i + 1)) }
      .getOrElse(0L)

    val schema = StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("dcg_micro", LongType, nullable = false),
      StructField("idcg_micro", LongType, nullable = false),
      StructField("ndcg_micro", LongType, nullable = false),
      StructField("mrr_micro", LongType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(k, dcg, idcg, ndcgMicro, mrrMicro)),
      schema)
  }

  def ndcgOracleSql(query: String, lang: String, k: Int): String = {
    val nTerms = TextAnalyzer.analyze(query).distinct.length
    val scoredSql = Fts.bm25ScoredOracleSql(query, lang)
    s"""WITH scored AS (
       |$scoredSql
       |), ranked AS (
       |  SELECT grade,
       |    row_number() OVER (ORDER BY score DESC, doc_id ASC) AS pos
       |  FROM scored
       |), ideal AS (
       |  SELECT grade,
       |    row_number() OVER (ORDER BY grade DESC, pos ASC) AS ipos
       |  FROM ranked
       |), dcg AS (
       |  SELECT coalesce(CAST(sum(CAST(round(
       |      (pow(2.0, grade) - 1.0) / log2(pos + 1) * 1000000)
       |    AS BIGINT)) AS BIGINT), 0) AS dcg_micro
       |  FROM ranked WHERE pos <= $k
       |), idcg AS (
       |  SELECT coalesce(CAST(sum(CAST(round(
       |      (pow(2.0, grade) - 1.0) / log2(ipos + 1) * 1000000)
       |    AS BIGINT)) AS BIGINT), 0) AS idcg_micro
       |  FROM ideal WHERE ipos <= $k
       |), mrr AS (
       |  SELECT coalesce(CAST(round(1000000.0 / min(pos)) AS BIGINT), 0)
       |    AS mrr_micro
       |  FROM ranked WHERE pos <= $k AND grade = $nTerms
       |)
       |SELECT $k AS k, dcg_micro, idcg_micro,
       |  CASE WHEN idcg_micro = 0 THEN 0
       |       ELSE dcg_micro * 1000000 // idcg_micro END AS ndcg_micro,
       |  mrr_micro
       |FROM dcg, idcg, mrr""".stripMargin
  }
}
