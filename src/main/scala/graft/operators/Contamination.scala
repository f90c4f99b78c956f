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

  /** TRAINING-SET RELEASE MANIFEST — the last table a pipeline writes
    * before handing a corpus to a training run, composing the two
    * halves this engine already oracles separately:
    * [[graft.operators.Dedup.curationApply]] (the curated survivor
    * set, span-cleaned, md5-pinned) and this screen's benchmark
    * decontamination. Every CURATED doc lands in exactly one bucket:
    *   `eval_slice`    — the benchmark slice itself (doc_id ≡ 0 mod
    *                     `mod`): eval text never ships in a train set;
    *   `contaminated`  — shares ≥1 verbatim n-gram with the benchmark
    *                     slice (the GPT-3 appendix-C drop rule, strict
    *                     form: ANY overlap drops — no float threshold
    *                     to disagree over);
    *   `released`      — everything else: the shipped training corpus.
    * Output per source: the three bucket counts (reconciling to the
    * curated count by construction), released token totals, and
    * `release_md5` — md5 over the released docs' cleaned_md5 digests
    * in doc_id order, ONE hash a training job can pin its data lineage
    * to.
    *
    * Scale shape: nothing new at corpus grain — the curated side is
    * the oracled curationApply chain; the hit set is the screen's
    * broadcast semi-probe (the benchmark gram set is eval-suite-sized,
    * fixed); buckets resolve in one left join; output is nSources
    * rows. */
  def releaseManifest(spark: SparkSession, dir: String,
      threshold: Double, mod: Long): DataFrame = {
    val curated = Dedup.curationApply(spark, dir, threshold)
    // cached: the gram frame feeds BOTH the benchmark-set build and the
    // train-side probe — uncached each side re-tokenizes the corpus
    val grams = CacheScope.cached(
      docGrams(Tables.documentsDense(spark, dir)))
    val bench = grams.filter(col("doc_id") % mod === 0)
      .select(explode(col("grams")).as("gram")).distinct()
    val hits = grams.filter(col("doc_id") % mod =!= 0)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(bench), "gram")
      .select("doc_id").distinct()
      .withColumn("hit", lit(1))
    val bucketed = curated
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_kept"),
        col("cleaned_md5"),
        when(col("doc_id") % mod === 0, lit("eval_slice"))
          .when(col("hit").isNotNull, lit("contaminated"))
          .otherwise(lit("released")).as("bucket"))
      .transform(CacheScope.cached)
    val counts = bucketed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_curated"),
        sum(when(col("bucket") === "eval_slice", 1L).otherwise(0L))
          .as("n_eval_slice"),
        sum(when(col("bucket") === "contaminated", 1L).otherwise(0L))
          .as("n_contaminated"),
        sum(when(col("bucket") === "released", 1L).otherwise(0L))
          .as("n_released"))
    val dig = bucketed.filter(col("bucket") === "released")
      .groupBy(col("source"))
      .agg(sum(col("n_kept")).as("n_tokens_released"),
        md5(concat_ws("",
          transform(array_sort(collect_list(struct(col("doc_id"),
            col("cleaned_md5")))), x => x.getField("cleaned_md5")))
          .cast("binary")).as("release_md5"))
    counts.join(dig, Seq("source"), "left")
      .select(col("source"), col("n_curated"), col("n_eval_slice"),
        col("n_contaminated"), col("n_released"),
        coalesce(col("n_tokens_released"), lit(0L))
          .as("n_tokens_released"),
        coalesce(col("release_md5"),
          lit("d41d8cd98f00b204e9800998ecf8427e")).as("release_md5"))
      .orderBy(col("source").asc)
  }

  def releaseManifestOracleSql(threshold: Double, mod: Long): String = {
    val gramExpr = (1 to GramSize).map(j => s"tl[i + ${j - 1}]")
      .mkString(" || ' ' || ")
    s"""${Dedup.curationApplyCtes(threshold)}, ctl AS (
       |  SELECT doc_id, list_filter(
       |    string_split_regex(lower(text), '\\W+'),
       |    t -> ${TextAnalyzer.sqlTermFilter("t")}) AS tl
       |  FROM documents
       |), cgrams AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(tl) - ${GramSize - 1}, 0) + 1),
       |    i -> $gramExpr))) AS gram
       |  FROM ctl
       |), cbench AS MATERIALIZED (
       |  SELECT DISTINCT gram FROM cgrams WHERE doc_id % $mod = 0
       |), hitdocs AS (
       |  SELECT DISTINCT g.doc_id
       |  FROM cgrams g JOIN cbench b ON b.gram = g.gram
       |  WHERE g.doc_id % $mod <> 0
       |), bucketed AS MATERIALIZED (
       |  SELECT p.doc_id, p.source, p.n_kept, p.cleaned_md5,
       |    CASE WHEN p.doc_id % $mod = 0 THEN 'eval_slice'
       |         WHEN h.doc_id IS NOT NULL THEN 'contaminated'
       |         ELSE 'released' END AS bucket
       |  FROM perdoc p LEFT JOIN hitdocs h ON h.doc_id = p.doc_id
       |), cnt AS (
       |  SELECT source, count(*) AS n_curated,
       |    CAST(sum(CASE WHEN bucket = 'eval_slice' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_eval_slice,
       |    CAST(sum(CASE WHEN bucket = 'contaminated' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_contaminated,
       |    CAST(sum(CASE WHEN bucket = 'released' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_released
       |  FROM bucketed GROUP BY source
       |), dig AS (
       |  SELECT source,
       |    CAST(sum(n_kept) AS BIGINT) AS n_tokens_released,
       |    md5(string_agg(cleaned_md5, '' ORDER BY doc_id))
       |      AS release_md5
       |  FROM bucketed WHERE bucket = 'released' GROUP BY source
       |)
       |SELECT c.source, c.n_curated, c.n_eval_slice, c.n_contaminated,
       |  c.n_released,
       |  coalesce(d.n_tokens_released, 0) AS n_tokens_released,
       |  coalesce(d.release_md5, md5('')) AS release_md5
       |FROM cnt c LEFT JOIN dig d ON d.source = c.source
       |ORDER BY c.source ASC""".stripMargin
  }
}
