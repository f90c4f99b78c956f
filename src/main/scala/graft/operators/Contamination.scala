package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalyzer

/** Benchmark-contamination screening — the training-data hygiene pass
  * every large-scale pipeline runs before pretraining: flag corpus
  * documents sharing verbatim token n-grams with a held-out benchmark
  * set (the n-gram-overlap decontamination of GPT-3 appendix C /
  * Dodge et al. 2021's C4 analysis). A document that reproduces a
  * benchmark passage would leak eval answers into training.
  *
  * Here the "benchmark suite" is a deterministic slice of the corpus
  * itself (doc_id ≡ 0 mod `mod`) so the check is self-contained and
  * oracle-gateable; in production it would be the eval suite's text.
  *
  * Scale shape: gram extraction is scan-local (same tokenizer-barrier
  * pattern as Dedup.docShingleSets); the benchmark gram set is tiny and
  * FIXED-SIZE (an eval suite doesn't grow with the corpus), so it
  * broadcasts — the screen over 100 TB is one scan + a broadcast hash
  * semi-probe + a per-doc count of the (rare) hits. No corpus-side
  * shuffle of gram sets, no self-join.
  */
object Contamination {

  /** Token n-gram size. 3 mirrors the shingle family's granularity;
    * production decontamination typically uses 8-13, which at these
    * fixture text lengths would make every screen trivially empty. */
  val GramSize = 3

  /** (doc_id, grams) — the DISTINCT token n-gram array per document,
    * scan-local behind a tokenizer barrier. */
  def docGrams(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        explode(array(TextAnalyzer.tokens(col("text")))).as("toks"))
    val idx = when(size(col("toks")) >= GramSize,
      sequence(lit(0), size(col("toks")) - GramSize))
      .otherwise(array().cast("array<int>"))
    val grams = transform(idx,
      i => concat_ws(" ",
        (0 until GramSize).map(j => element_at(col("toks"), i + j + 1)): _*))
    toks.select(col("doc_id"),
      explode(array(array_distinct(grams))).as("grams"))
  }

  /** The screen: for every non-benchmark document sharing at least one
    * n-gram with the benchmark slice, report how many distinct grams
    * overlap and the contaminated fraction of its gram set.
    * Output (doc_id, n_grams, shared_grams, contamination), worst
    * first. */
  def screen(spark: SparkSession, dir: String, mod: Long): DataFrame = {
    val grams = docGrams(Tables.documentsDense(spark, dir))
    val bench = grams.filter(col("doc_id") % mod === 0)
      .select(explode(col("grams")).as("gram")).distinct()
    val train = grams.filter(col("doc_id") % mod =!= 0)
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        explode(col("grams")).as("gram"))
    // per-doc grams and the benchmark set are both distinct, so the
    // inner join hits each shared gram exactly once — count(*) IS the
    // distinct-overlap size
    train.join(broadcast(bench), "gram")
      .groupBy("doc_id", "n_grams")
      .agg(count(lit(1)).as("shared_grams"))
      .select(col("doc_id"), col("n_grams"), col("shared_grams"),
        round(col("shared_grams").cast("double") / col("n_grams"), 6)
          .as("contamination"))
      .orderBy(col("shared_grams").desc, col("doc_id").asc)
  }

  def screenOracleSql(mod: Long): String = {
    val gramExpr = (1 to GramSize).map(j => s"tl[i + ${j - 1}]")
      .mkString(" || ' ' || ")
    s"""WITH toklists AS (
       |  SELECT doc_id, list_filter(
       |    string_split_regex(lower(text), '\\W+'),
       |    t -> ${TextAnalyzer.sqlTermFilter("t")}) AS tl
       |  FROM documents
       |), grams AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(tl) - ${GramSize - 1}, 0) + 1),
       |    i -> $gramExpr))) AS gram
       |  FROM toklists
       |), counts AS (
       |  SELECT doc_id, count(*) AS n_grams FROM grams
       |  WHERE doc_id % $mod <> 0 GROUP BY doc_id
       |), bench AS (
       |  SELECT DISTINCT gram FROM grams WHERE doc_id % $mod = 0
       |), shared AS (
       |  SELECT g.doc_id, count(*) AS shared_grams
       |  FROM grams g JOIN bench b ON b.gram = g.gram
       |  WHERE g.doc_id % $mod <> 0
       |  GROUP BY g.doc_id
       |)
       |SELECT s.doc_id, c.n_grams, s.shared_grams,
       |  round(CAST(s.shared_grams AS DOUBLE) / c.n_grams, 6)
       |    AS contamination
       |FROM shared s JOIN counts c ON c.doc_id = s.doc_id
       |ORDER BY s.shared_grams DESC, s.doc_id ASC""".stripMargin
  }
}
