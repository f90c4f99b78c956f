package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalyzer

/** Distributed BPE tokenizer training (Sennrich et al. 2016) — the
  * tokenizer-fitting step of a pretraining pipeline, run as Spark
  * aggregations over the corpus instead of a single-machine loop. The
  * reference has no tokenizer training (it ships text to an external
  * embedding service); a training-data engine needs one in-house.
  *
  * Standard BPE trains on the WORD-FREQUENCY table, not raw text:
  * distinct analyzed tokens with corpus counts (one distributed
  * groupBy — the only corpus-sized pass). Each merge step is then
  * (1) adjacent-symbol-pair counts weighted by word frequency — a
  * partial-aggregable shuffle over the vocab table, (2) argmax pair
  * (count desc, pair asc — a bounded LIMIT 1 collect, the IVF-centroid
  * pattern), (3) a scan-local greedy rewrite of every word's symbol
  * array. At 100 TB the vocab table is millions of rows — still tiny
  * next to the corpus; the per-merge cost never rescans documents.
  *
  * The greedy left-to-right merge is a FOLD: walk the symbols, and if
  * the accumulator's last symbol is `l` and the next is `r`, replace
  * the last with `l+r`, else append. A fold is exactly Sennrich's
  * scan-replace (a merged token can never re-match as `l` within the
  * same step, since `l+r` ≠ `l`), and Spark's `aggregate` higher-order
  * function runs it codegen'd with zero shuffle. The oracle reproduces
  * the identical semantics with window functions (merge-position
  * parity within equal-symbol runs — proven equivalent to the fold).
  *
  * Determinism: pair counts are exact integers; the argmax tiebreak is
  * total (count desc, left asc, right asc); the rewrite is
  * deterministic per word. No doubles anywhere.
  */
object Bpe {

  val Merges = 8

  /** Fit result: the rewritten word-frequency table (word, freq, syms
    * after `Merges` steps) and the merge log. */
  private def fit(spark: SparkSession,
      dir: String): (DataFrame, Seq[(Long, String, String, Long)]) = {
    var wf = Tables.documents(spark, dir)
      .select(explode(TextAnalyzer.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("word"), ""))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (step <- 1 to Merges) {
      val pairs = wf
        .select(col("freq"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
      // bounded collect: exactly one row — the argmax merge pair
      val best = pairs
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      require(best.nonEmpty, s"corpus fully merged before step $step")
      val (l, r, cnt) = (best(0).getString(0), best(0).getString(1),
        best(0).getLong(2))
      merges += ((step.toLong, l, r, cnt))
      val merged = lit(l + r)
      wf = wf.withColumn("syms",
        aggregate(col("syms"), array().cast("array<string>"),
          (acc, x) => when(
            size(acc) > 0 && try_element_at(acc, lit(-1)) === lit(l) &&
              x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
            .otherwise(concat(acc, array(x)))))
        .localCheckpoint(true)
    }
    (wf, merges.result())
  }

  /** The learned merge table: (step, left_sym, right_sym, pair_count)
    * for `Merges` steps — the artifact a tokenizer ships. */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    fit(spark, dir)._2
      .toDF("step", "left_sym", "right_sym", "pair_count")
      .orderBy(col("step").asc)
  }

  /** The tokenizer APPLIED: corpus frequency of each learned symbol —
    * Σ over words of word-freq × symbol occurrences, straight off the
    * fitted vocab table (no corpus rescan; the word-frequency table IS
    * the corpus aggregate). Top-`k` by count, token-asc tiebreak. */
  def bpeVocab(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val (wf, _) = fit(spark, dir)
    wf.select(col("freq"), explode(col("syms")).as("token"))
      .groupBy(col("token"))
      .agg(sum(col("freq")).as("corpus_count"))
      .orderBy(col("corpus_count").desc, col("token").asc)
      .limit(k)
  }

  /** Compression under the learned tokenizer, per source: chars per
    * BPE token in micro-units (integral) — the Pile-style "how well
    * does the tokenizer fit this slice" signal; a source that
    * compresses poorly is out-of-distribution for the vocab. Doc words
    * join the fitted vocab table (broadcast — vocab-bounded). */
  def bpeCompression(spark: SparkSession, dir: String): DataFrame = {
    val (wf, _) = fit(spark, dir)
    val vocab = wf.select(col("word"), size(col("syms")).cast("long")
      .as("n_toks"))
    Tables.documents(spark, dir)
      .select(col("source"),
        explode(TextAnalyzer.tokens(col("text"))).as("word"))
      .join(broadcast(vocab), Seq("word"))
      .groupBy(col("source"))
      .agg(sum(length(col("word")).cast("long")).as("total_chars"),
        sum(col("n_toks")).as("total_tokens"))
      .select(col("source"), col("total_chars"), col("total_tokens"),
        expr("total_chars * 1000000 div total_tokens")
          .as("chars_per_token_micro"))
      .orderBy(col("source").asc)
  }

  def bpeCompressionOracleSql: String = {
    val steps = (1 to Merges).map(stepSql).mkString(", ")
    s"""WITH tok AS (
       |  SELECT t AS word FROM (
       |    SELECT ${TextAnalyzer.sqlTokenize("text")} AS t
       |    FROM documents) u
       |  WHERE ${TextAnalyzer.sqlTermFilter("t")}
       |), wf0 AS (
       |  SELECT word, count(*) AS freq, string_split(word, '') AS syms
       |  FROM tok GROUP BY word
       |), $steps, dtok AS (
       |  SELECT source, t AS word FROM (
       |    SELECT source, ${TextAnalyzer.sqlTokenize("text")} AS t
       |    FROM documents) u
       |  WHERE ${TextAnalyzer.sqlTermFilter("t")}
       |), agg AS (
       |  SELECT d.source,
       |    CAST(sum(length(d.word)) AS BIGINT) AS total_chars,
       |    CAST(sum(len(w.syms)) AS BIGINT) AS total_tokens
       |  FROM dtok d JOIN wf$Merges w ON w.word = d.word
       |  GROUP BY d.source
       |)
       |SELECT source, total_chars, total_tokens,
       |  CAST(total_chars * 1000000 // total_tokens AS BIGINT)
       |    AS chars_per_token_micro
       |FROM agg ORDER BY source ASC""".stripMargin
  }

  def bpeVocabOracleSql(k: Int): String = {
    val steps = (1 to Merges).map(stepSql).mkString(", ")
    s"""WITH tok AS (
       |  SELECT t AS word FROM (
       |    SELECT ${TextAnalyzer.sqlTokenize("text")} AS t
       |    FROM documents) u
       |  WHERE ${TextAnalyzer.sqlTermFilter("t")}
       |), wf0 AS (
       |  SELECT word, count(*) AS freq, string_split(word, '') AS syms
       |  FROM tok GROUP BY word
       |), $steps
       |SELECT token, CAST(sum(freq) AS BIGINT) AS corpus_count
       |FROM (SELECT freq, unnest(syms) AS token FROM wf$Merges) x
       |GROUP BY token ORDER BY corpus_count DESC, token ASC
       |LIMIT $k""".stripMargin
  }

  /** One unrolled merge step: from `wf${i-1}` derive the best pair
    * `b$i` and the rewritten vocab `wf$i`. The rewrite mirrors the
    * Spark fold: a pair merges at a position iff it matches and — for
    * the self-pair case l = r — sits at even offset within its maximal
    * run of `l` symbols (greedy non-overlap). */
  private def stepSql(i: Int): String =
    s"""e$i AS (
       |  SELECT word, freq, generate_subscripts(syms, 1) AS pos,
       |    unnest(syms) AS sym
       |  FROM wf${i - 1}
       |), n$i AS (
       |  SELECT word, freq, pos, sym,
       |    lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
       |  FROM e$i
       |), b$i AS (
       |  SELECT sym AS l, nxt AS r, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM n$i WHERE nxt IS NOT NULL
       |  GROUP BY 1, 2 ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
       |), f$i AS (
       |  SELECT n.word, n.freq, n.pos, n.sym, n.nxt, b.l, b.r,
       |    coalesce(max(CASE WHEN n.sym != b.l THEN n.pos END)
       |      OVER (PARTITION BY n.word ORDER BY n.pos
       |            ROWS UNBOUNDED PRECEDING), 0) AS lna
       |  FROM n$i n CROSS JOIN b$i b
       |), g$i AS (
       |  SELECT word, freq, pos, sym, l, r,
       |    (sym = l AND nxt = r AND
       |     (l != r OR (pos - (lna + 1)) % 2 = 0)) AS mf
       |  FROM f$i
       |), h$i AS (
       |  SELECT word, freq, pos, sym, l, r, mf,
       |    coalesce(lag(mf) OVER (PARTITION BY word ORDER BY pos),
       |      false) AS consumed
       |  FROM g$i
       |), wf$i AS (
       |  SELECT word, freq,
       |    list(CASE WHEN mf THEN l || r ELSE sym END ORDER BY pos)
       |      FILTER (WHERE NOT consumed) AS syms
       |  FROM h$i GROUP BY word, freq
       |)""".stripMargin

  def bpeMergesOracleSql: String = {
    val steps = (1 to Merges).map(stepSql).mkString(", ")
    val out = (1 to Merges).map(i =>
      s"SELECT CAST($i AS BIGINT) AS step, l AS left_sym, " +
        s"r AS right_sym, cnt AS pair_count FROM b$i")
      .mkString(" UNION ALL ")
    s"""WITH tok AS (
       |  SELECT t AS word FROM (
       |    SELECT ${TextAnalyzer.sqlTokenize("text")} AS t
       |    FROM documents) u
       |  WHERE ${TextAnalyzer.sqlTermFilter("t")}
       |), wf0 AS (
       |  SELECT word, count(*) AS freq, string_split(word, '') AS syms
       |  FROM tok GROUP BY word
       |), $steps
       |$out ORDER BY step ASC""".stripMargin
  }
}
