package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalyzer

/** Distributed multinomial Naive Bayes over the documents table — the
  * model-based quality/routing classifier of a training-data pipeline
  * (the fastText-classifier role in public LLM curation recipes: score
  * every document with a cheap linear model, route or filter on the
  * prediction). The reference ships embeddings to an external model
  * service (/root/reference/src/core/embedding_client.py); this is the
  * in-engine counterpart: TRAINING is one shuffle of (class, term)
  * counts, SCORING is a broadcast-model scan — no service round-trip.
  *
  * Label = `lang`; split is doc_id % 5 (held-out fifth). Add-one
  * smoothing: P(t|c) = (n_tc + 1) / (T_c + V).
  *
  * Scale shape (100 TB): training = explode tokens + one
  * partial-aggregable groupBy(lang, term) — the exchange carries
  * distinct (class, term) pairs, not token instances. The model table
  * is vocab-bounded; scoring joins test tokens to it — broadcast here,
  * a term-keyed shuffle join at corpus vocab. The per-document argmax
  * is a doc-partitioned window over n_classes rows. Nothing converges
  * on one reducer.
  *
  * Cross-engine determinism: every per-token log term is rounded to
  * integer NANO-units (round(ln(ratio)·1e9) as BIGINT) before summing —
  * long addition is order-independent, so the per-(doc, class) scores
  * and the argmax compare exactly across engines (the
  * quality_unigram_lm pattern; see graft-oracle rules). Priors fold the
  * same way.
  */
object Classifier {

  /** Train/test split modulus: doc_id % Split == 0 is held out. */
  val Split = 5L

  private def trainDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsDense(spark, dir).filter(col("doc_id") % Split =!= 0)

  private def testDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsDense(spark, dir).filter(col("doc_id") % Split === 0)

  private def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      explode(TextAnalyzer.tokens(col("text"))).as("term"))

  /** (lang, term) → training count. One partial-aggregable shuffle. */
  private def termCounts(spark: SparkSession, dir: String): DataFrame =
    // persisted once per corpus generation (EvalCache discipline): the
    // (class, term, n) count table IS the trained NB model — a pure
    // function of the corpus split, re-tokenizing the train corpus per
    // invocation was the nb_model/nb_confusion job-floor cost (r16).
    // Vocab-grain rows, one bucket.
    EvalCache.ensure(spark, dir, "documents", "nbcnt", "term")(
      tokenized(trainDocs(spark, dir))
        .groupBy(col("lang"), col("term"))
        .agg(count(lit(1)).as("n")))

  /** The training artifact: top-`k` terms per class by count (term-asc
    * tiebreak) with the smoothed nano-log-prob each carries into
    * scoring — the inspectable "what did the model learn" surface. */
  def nbModel(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val counts = termCounts(spark, dir)
    val totals = counts.groupBy(col("lang").as("t_lang"))
      .agg(sum(col("n")).as("t_c"))
    val vocab = counts.select(countDistinct(col("term")).as("v"))
    val w = Window.partitionBy("lang")
      .orderBy(col("n").desc, col("term").asc)
    counts
      .join(broadcast(totals), col("lang") === col("t_lang"))
      .crossJoin(broadcast(vocab))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("term"), col("n"),
        round(log((col("n") + 1).cast("double") /
          (col("t_c") + col("v"))) * 1e9).cast("long").as("logp_nano"))
      .orderBy(col("lang").asc, col("rank").asc)
  }

  def nbModelOracleSql(k: Int): String =
    s"""WITH tok AS (
       |  SELECT lang, t AS term FROM (
       |    SELECT lang, ${TextAnalyzer.sqlTokenize("text")} AS t
       |    FROM documents WHERE doc_id % $Split != 0) u
       |  WHERE ${TextAnalyzer.sqlTermFilter("t")}
       |), m AS (
       |  SELECT lang, term, count(*) AS n FROM tok GROUP BY 1, 2
       |), tot AS (
       |  SELECT lang, sum(n) AS t_c FROM m GROUP BY 1
       |), voc AS (
       |  SELECT count(DISTINCT term) AS v FROM m
       |), r AS (
       |  SELECT m.lang, m.term, CAST(m.n AS BIGINT) AS n,
       |    CAST(round(ln(CAST(m.n + 1 AS DOUBLE) / (tot.t_c + voc.v))
       |      * 1e9) AS BIGINT) AS logp_nano,
       |    row_number() OVER (PARTITION BY m.lang
       |      ORDER BY m.n DESC, m.term ASC) AS rank
       |  FROM m JOIN tot ON tot.lang = m.lang CROSS JOIN voc
       |)
       |SELECT lang, CAST(rank AS BIGINT) AS rank, term, n, logp_nano
       |FROM r WHERE rank <= $k
       |ORDER BY lang ASC, rank ASC""".stripMargin

  /** Held-out confusion matrix: classify each test document by argmax
    * class score (score-desc, lang-asc tiebreak), tally
    * (true_lang, pred_lang). The one number a pipeline owner reads
    * before trusting the classifier as a filter. */
  def nbConfusion(spark: SparkSession, dir: String): DataFrame = {
    // ONE tokenize+count pass: cstat, vocab and the model broadcast all
    // derive from `counts`, and each broadcast build is its own job —
    // uncached, the corpus re-tokenized once per subtree (3×; the
    // dominant cost of this query's bench entry). The cached frame is
    // vocab-bounded (distinct (class, term) pairs), not token-grain.
    val counts = CacheScope.cached(termCounts(spark, dir))
    // per-class stats: token total, doc count, nano prior — a
    // classes-sized frame, broadcast into the scoring scan
    val train = trainDocs(spark, dir)
    val nTrain = train.select(count(lit(1)).as("n_train"))
    val cstat = counts.groupBy(col("lang").as("c_lang"))
      .agg(sum(col("n")).as("t_c"))
      .join(train.groupBy(col("lang").as("d_lang"))
          .agg(count(lit(1)).as("docs_c")),
        col("c_lang") === col("d_lang"))
      .crossJoin(nTrain)
      .select(col("c_lang"), col("t_c"),
        round(log(col("docs_c").cast("double") / col("n_train")) * 1e9)
          .cast("long").as("prior_nano"))
    val vocab = counts.select(countDistinct(col("term")).as("v"))
    // test tokens × classes, left-joined to the model: absent (class,
    // term) pairs score the smoothed zero-count mass
    val model = counts.select(col("lang").as("m_lang"),
      col("term").as("m_term"), col("n"))
    val scoredTerms = tokenized(testDocs(spark, dir))
      .withColumnRenamed("lang", "true_lang")
      .crossJoin(broadcast(cstat))
      .crossJoin(broadcast(vocab))
      .join(broadcast(model),
        col("c_lang") === col("m_lang") && col("term") === col("m_term"),
        "left")
      .select(col("doc_id"), col("true_lang"), col("c_lang"),
        col("prior_nano"),
        round(log((coalesce(col("n"), lit(0L)) + 1).cast("double") /
          (col("t_c") + col("v"))) * 1e9).cast("long").as("term_nano"))
    val scores = scoredTerms
      .groupBy(col("doc_id"), col("true_lang"), col("c_lang"),
        col("prior_nano"))
      .agg(sum(col("term_nano")).as("sum_nano"))
      .select(col("doc_id"), col("true_lang"), col("c_lang"),
        (col("prior_nano") + col("sum_nano")).as("score_nano"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_nano").desc, col("c_lang").asc)
    scores
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .groupBy(col("true_lang"), col("c_lang").as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("true_lang").asc, col("pred_lang").asc)
  }

  val nbConfusionOracleSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, lang, t AS term FROM (
       |    SELECT doc_id, lang, ${TextAnalyzer.sqlTokenize("text")} AS t
       |    FROM documents WHERE doc_id % $Split != 0) u
       |  WHERE ${TextAnalyzer.sqlTermFilter("t")}
       |), m AS (
       |  SELECT lang, term, count(*) AS n FROM tok GROUP BY 1, 2
       |), cstat AS (
       |  SELECT m.lang AS c_lang, sum(n) AS t_c FROM m GROUP BY 1
       |), dstat AS (
       |  SELECT lang, count(*) AS docs_c FROM documents
       |  WHERE doc_id % $Split != 0 GROUP BY 1
       |), ntr AS (
       |  SELECT count(*) AS n_train FROM documents WHERE doc_id % $Split != 0
       |), prior AS (
       |  SELECT c_lang, t_c,
       |    CAST(round(ln(CAST(docs_c AS DOUBLE) / n_train) * 1e9)
       |      AS BIGINT) AS prior_nano
       |  FROM cstat JOIN dstat ON dstat.lang = cstat.c_lang CROSS JOIN ntr
       |), voc AS (
       |  SELECT count(DISTINCT term) AS v FROM m
       |), ttok AS (
       |  SELECT doc_id, lang AS true_lang, t AS term FROM (
       |    SELECT doc_id, lang, ${TextAnalyzer.sqlTokenize("text")} AS t
       |    FROM documents WHERE doc_id % $Split = 0) u
       |  WHERE ${TextAnalyzer.sqlTermFilter("t")}
       |), scored AS (
       |  SELECT tt.doc_id, tt.true_lang, p.c_lang, p.prior_nano,
       |    CAST(round(ln(CAST(coalesce(m.n, 0) + 1 AS DOUBLE) /
       |      (p.t_c + voc.v)) * 1e9) AS BIGINT) AS term_nano
       |  FROM ttok tt CROSS JOIN prior p CROSS JOIN voc
       |  LEFT JOIN m ON m.lang = p.c_lang AND m.term = tt.term
       |), sc AS (
       |  SELECT doc_id, true_lang, c_lang,
       |    prior_nano + sum(term_nano) AS score_nano
       |  FROM scored GROUP BY doc_id, true_lang, c_lang, prior_nano
       |), pred AS (
       |  SELECT doc_id, true_lang, c_lang,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score_nano DESC, c_lang ASC) AS rk
       |  FROM sc
       |)
       |SELECT true_lang, c_lang AS pred_lang, count(*) AS n_docs
       |FROM pred WHERE rk = 1
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
