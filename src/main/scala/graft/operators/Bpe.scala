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
  * groupBy — the only corpus-sized pass). Merges are then learned in
  * BATCHED PASSES: each pass (1) counts adjacent symbol pairs weighted
  * by word frequency — a partial-aggregable shuffle over the vocab
  * table, (2) collects the top-`BatchSize` pairs (count desc, pair asc
  * — ONE bounded collect per pass, the IVF-centroid pattern), keeps
  * the non-conflicting ones (rule below), and (3) applies ALL kept
  * merges in one scan-local rewrite of every word's symbol array.
  * Batching is what makes the trainer real: a 30k-merge vocab at one
  * driver round trip per merge is 30k jobs; at `BatchSize` merges per
  * pass it is 30k/B — the same reason production BPE trainers batch.
  * At 100 TB the vocab table is millions of rows — still tiny next to
  * the corpus; no pass ever rescans documents.
  *
  * CONFLICT RULE (the price of batching, applied identically in the
  * oracle): within a pass, candidate pairs are ranked by snapshot
  * count (desc, then l asc, r asc); a candidate is kept iff NO
  * higher-ranked candidate in the pass shares a symbol with it, where
  * a pair's symbols are {l, r, l||r}. Symbol-disjoint merges commute —
  * applying one cannot create, destroy, or overlap occurrences of
  * another, and the merged token of one can never re-match as a side
  * of another — so the simultaneous rewrite equals any sequential
  * order of the kept pairs at their snapshot counts. (Checking against
  * all higher-ranked candidates, not just kept ones, keeps the rule
  * expressible as a rank self-join in SQL — no greedy recursion.)
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

  /** Merge passes and candidates collected per pass: up to
    * Passes·BatchSize merges total (data-dependent — conflicts within
    * a pass reject candidates; every pass keeps at least its rank-1). */
  val Passes = 3
  val BatchSize = 8

  /** The pass conflict filter (see object doc): keep candidate `i` iff
    * no higher-ranked candidate shares a symbol with it, symbols of a
    * pair being {l, r, l||r}. Shared by fit() and the spec reference. */
  def keepNonConflicting(ranked: Seq[(String, String, Long)])
      : Seq[(String, String, Long)] =
    ranked.zipWithIndex.filter { case ((l, r, _), i) =>
      ranked.take(i).forall { case (l2, r2, _) =>
        Set(l, r, l + r).intersect(Set(l2, r2, l2 + r2)).isEmpty
      }
    }.map(_._1)

  /** Fit result: the rewritten word-frequency table (word, freq, syms
    * after `Passes` batched passes) and the merge log. */
  private def fit(spark: SparkSession,
      dir: String): (DataFrame, Seq[(Long, String, String, Long)]) = {
    var wf = Tables.documentsDense(spark, dir)
      .select(explode(TextAnalyzer.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("word"), ""))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var step = 0L
    for (pass <- 1 to Passes) {
      val pairs = wf
        .select(col("freq"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
      // bounded collect: BatchSize rows — ONE driver action per pass
      val ranked = pairs
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(BatchSize).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      require(ranked.nonEmpty || pass > 1,
        "corpus fully merged before pass 1")
      val kept = keepNonConflicting(ranked)
      kept.foreach { case (l, r, cnt) =>
        step += 1; merges += ((step, l, r, cnt))
      }
      if (kept.nonEmpty) {
        // simultaneous rewrite: the same greedy left-to-right fold, its
        // merge condition now a when-chain over the pass's kept pairs.
        // Symbol-disjointness makes the chain order irrelevant: at any
        // position at most one pair can match.
        wf = wf.withColumn("syms",
          aggregate(col("syms"), array().cast("array<string>"),
            (acc, x) => {
              val last = try_element_at(acc, lit(-1))
              val base: Column = concat(acc, array(x))
              kept.foldRight(base) { case ((l, r, _), els) =>
                when(
                  size(acc) > 0 && last === lit(l) && x === lit(r),
                  concat(slice(acc, lit(1), size(acc) - 1),
                    array(lit(l + r))))
                  .otherwise(els)
              }
            }))
          .localCheckpoint(true)
      }
    }
    (wf, merges.result())
  }

  /** The learned merge table: (step, left_sym, right_sym, pair_count)
    * across all passes — the artifact a tokenizer ships. */
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
    Tables.documentsDense(spark, dir)
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
    val steps = (1 to Passes).map(passSql).mkString(", ")
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
       |  FROM dtok d JOIN wf$Passes w ON w.word = d.word
       |  GROUP BY d.source
       |)
       |SELECT source, total_chars, total_tokens,
       |  CAST(total_chars * 1000000 // total_tokens AS BIGINT)
       |    AS chars_per_token_micro
       |FROM agg ORDER BY source ASC""".stripMargin
  }

  def bpeVocabOracleSql(k: Int): String = {
    val steps = (1 to Passes).map(passSql).mkString(", ")
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
       |FROM (SELECT freq, unnest(syms) AS token FROM wf$Passes) x
       |GROUP BY token ORDER BY corpus_count DESC, token ASC
       |LIMIT $k""".stripMargin
  }

  /** One unrolled PASS: from `wf${i-1}` derive the ranked candidates
    * `rk$i` (top-BatchSize by snapshot count), the conflict-filtered
    * kept set `acc$i` (rank self-join — a pair's symbols are
    * {l, r, l||r}), and the simultaneously-rewritten vocab `wf$i`.
    * The rewrite mirrors the Spark fold: a position merges iff some
    * kept pair matches (sym, nxt) and — for the self-pair case l = r —
    * it sits at even offset within its maximal run of equal symbols
    * (greedy non-overlap). Symbol-disjointness of the kept set makes
    * the simultaneous window rewrite equal to the sequential fold. */
  private def passSql(i: Int): String =
    s"""e$i AS (
       |  SELECT word, freq, generate_subscripts(syms, 1) AS pos,
       |    unnest(syms) AS sym
       |  FROM wf${i - 1}
       |), n$i AS (
       |  SELECT word, freq, pos, sym,
       |    lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
       |  FROM e$i
       |), rk$i AS (
       |  SELECT sym AS l, nxt AS r, CAST(sum(freq) AS BIGINT) AS cnt,
       |    row_number() OVER (ORDER BY sum(freq) DESC, sym ASC, nxt ASC)
       |      AS rnk
       |  FROM n$i WHERE nxt IS NOT NULL
       |  GROUP BY 1, 2 ORDER BY rnk ASC LIMIT $BatchSize
       |), acc$i AS (
       |  SELECT a.l, a.r, a.cnt, a.rnk FROM rk$i a
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM rk$i b WHERE b.rnk < a.rnk AND (
       |      b.l IN (a.l, a.r, a.l || a.r) OR
       |      b.r IN (a.l, a.r, a.l || a.r) OR
       |      b.l || b.r IN (a.l, a.r, a.l || a.r)))
       |), f$i AS (
       |  SELECT word, freq, pos, sym, nxt,
       |    coalesce(max(CASE WHEN chg THEN pos END)
       |      OVER (PARTITION BY word ORDER BY pos
       |            ROWS UNBOUNDED PRECEDING), 1) AS run_start
       |  FROM (
       |    SELECT word, freq, pos, sym, nxt,
       |      coalesce(sym != lag(sym)
       |        OVER (PARTITION BY word ORDER BY pos), true) AS chg
       |    FROM n$i) z
       |), g$i AS (
       |  SELECT z.word, z.freq, z.pos, z.sym, z.nxt,
       |    (a.l IS NOT NULL AND
       |     (a.l != a.r OR (z.pos - z.run_start) % 2 = 0)) AS mf
       |  FROM f$i z LEFT JOIN acc$i a ON a.l = z.sym AND a.r = z.nxt
       |), h$i AS (
       |  SELECT word, freq, pos, sym, nxt, mf,
       |    coalesce(lag(mf) OVER (PARTITION BY word ORDER BY pos),
       |      false) AS consumed
       |  FROM g$i
       |), wf$i AS (
       |  SELECT word, freq,
       |    list(CASE WHEN mf THEN sym || nxt ELSE sym END ORDER BY pos)
       |      FILTER (WHERE NOT consumed) AS syms
       |  FROM h$i GROUP BY word, freq
       |)""".stripMargin

  def bpeMergesOracleSql: String = {
    val passes = (1 to Passes).map(passSql).mkString(", ")
    val out = (1 to Passes).map(i =>
      s"SELECT $i AS pass, rnk, l, r, cnt FROM acc$i")
      .mkString(" UNION ALL ")
    s"""WITH tok AS (
       |  SELECT t AS word FROM (
       |    SELECT ${TextAnalyzer.sqlTokenize("text")} AS t
       |    FROM documents) u
       |  WHERE ${TextAnalyzer.sqlTermFilter("t")}
       |), wf0 AS (
       |  SELECT word, count(*) AS freq, string_split(word, '') AS syms
       |  FROM tok GROUP BY word
       |), $passes
       |SELECT CAST(row_number() OVER (ORDER BY pass ASC, rnk ASC)
       |    AS BIGINT) AS step,
       |  l AS left_sym, r AS right_sym, cnt AS pair_count
       |FROM ($out) ORDER BY step ASC""".stripMargin
  }
}
