package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Binary (1-bit) quantization of the embedding column — the most
  * aggressive memory/bandwidth lever in the vector-search toolbox
  * (pgvector 0.7 grew `bit(n)` + hamming ops for exactly this; the
  * reference's pgvector path, /root/reference/src/core/vector_store.py
  * :263-319, would inherit it transparently). Each stored dimension
  * keeps its SIGN only: a 64-dim float32 vector (256 B) becomes two
  * 32-bit words packed into BIGINTs (16 B) — a 16x smaller scan
  * target, with the distance kernel reduced to bit arithmetic.
  *
  * Two estimators over the same stored bits:
  *
  *  - SYMMETRIC Hamming (both sides binarized): XOR + popcount — the
  *    SimHash angle estimate ([[Dedup.simhash]]'s geometry).
  *  - ASYMMETRIC score (the serving path): the QUERY keeps full
  *    precision and each sign mismatch costs |q_i| — the
  *    asymmetric-distance idea of Jégou et al.'s ADC applied to
  *    binary codes (compress the corpus, never the query). Same
  *    16-byte rows, measurably better ranking: recall@10 0.25 -> 0.47
  *    symmetric -> asymmetric on the sf0.01 fixture at identical cost.
  *
  * Serving shape (the standard BQ recipe): asymmetric scan over the
  * packed words -> top-nCand candidates -> exact cosine re-rank of the
  * survivors against the full vectors -> top-k.
  *
  * Determinism: packing is exact integer arithmetic (bit i set iff
  * v_i > 0; FLOAT->DOUBLE widening preserves sign). The asymmetric
  * weights are |round(q_i * 1e6)| — the repo's micro-unit trick, via
  * the SAME round() both engines define as half-away-from-zero — so
  * scores are integral and hash-gate against DuckDB bit-for-bit.
  *
  * Scale shape: the packing projection is scan-local (zero shuffles;
  * at 100 TB it is a persisted 16-byte-per-row projection, the same
  * build-once convention as [[ProductQuant.ensurePqTable]]); the probe
  * is one scan of the packed words + TakeOrderedAndProject, and the
  * refine joins a broadcast nCand-row candidate list back to the
  * full-vector table — never the other way round. The pack and score
  * kernels are native Catalyst expressions (one generated call each,
  * [[graft.functions.BqKernels]]): the first cut statically unrolled
  * 128 expression terms, which blew the JVM 64 KB generated-method
  * limit and silently degraded the scan to interpreted evaluation —
  * caught by the scale ladder, not by correctness.
  */
object BinaryQuant {

  private val WordBits = 32

  /** One packed word: sum of 2^i over the bits of `v` in
    * [off, off+32) that are strictly positive. A native loop kernel
    * ([[graft.functions.BqKernels.pack]]): the former 32 unrolled CASE
    * terms were correct but — combined with the 64-term score — pushed
    * whole-stage codegen past the JVM 64 KB method limit, silently
    * degrading the scan to interpreted evaluation. */
  private def packWord(v: Column, off: Int): Column =
    call_function("bq_pack", v, lit(off))

  /** Scan-local sign-bit codes: (vec_id, label, w0, w1). */
  def codes(emb: DataFrame): DataFrame = {
    val v = col("embedding")
    emb.select(col("vec_id"), col("label"),
      packWord(v, 0).as("w0"), packWord(v, WordBits).as("w1"))
  }

  /** Symmetric Hamming distance of two packed-word pairs. */
  private def hammingCol(aw0: Column, aw1: Column, bw0: Column,
      bw1: Column): Column =
    (bit_count(aw0.bitwiseXOR(bw0)) +
      bit_count(aw1.bitwiseXOR(bw1))).cast("int")

  /** Asymmetric score of stored words (w0, w1) against a full-precision
    * query vector `qv` (DOUBLE array, in-row or broadcast): each sign
    * mismatch costs |round(q_i*1e6)| micro-units. A native loop kernel
    * ([[graft.functions.BqKernels.asym]], bit-identical to the former
    * 64 unrolled terms — oracle-verified) so the probe genuinely stays
    * inside whole-stage codegen. */
  private def asymScore(w0: Column, w1: Column, qv: Column): Column =
    call_function("bq_asym", w0, w1, qv)

  /** BQ ANN search: asymmetric scan over the packed words, top-nCand,
    * exact cosine refine, top-k. Output (vec_id, label, ascore, dist).
    * With nCand >= corpus the result equals exact KNN (spec-gated). */
  def bqScan(spark: SparkSession, dir: String, qid: Long, nCand: Int,
      k: Int): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === lit(qid))
      .select(col("embedding").cast("array<double>").as("qv"),
        Similarity.norm(col("embedding")).as("qn"))
    // the one-row query frame rides the codes scan AND is carried
    // through the nCand-row candidate list into the refine join, so
    // the whole probe is a single pass over the 16-byte rows
    val cand = codes(emb).filter(col("vec_id") =!= lit(qid))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        asymScore(col("w0"), col("w1"), col("qv")).as("ascore"),
        col("qv"), col("qn"))
      .orderBy(col("ascore").asc, col("vec_id").asc)
      .limit(nCand)
    broadcast(cand)
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("vec_id"), col("label"), col("ascore"),
        round(lit(1.0) - Similarity.dot(col("embedding"), col("qv"))
          / (Similarity.norm(col("embedding")) * col("qn")), 6)
          .as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(k)
  }

  /** Oracle CTE exposing `c` = (vec_id, label, v DOUBLE[], w0, w1). */
  private def codesCte: String =
    s"""e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings
       |), c AS MATERIALIZED (
       |  SELECT vec_id, label, v,
       |    CAST(list_sum(list_transform(range(0, $WordBits),
       |      i -> CASE WHEN v[i+1] > 0 THEN (1::BIGINT << i)
       |           ELSE 0::BIGINT END)) AS BIGINT) AS w0,
       |    CAST(list_sum(list_transform(range(0, $WordBits),
       |      i -> CASE WHEN v[i+1+$WordBits] > 0 THEN (1::BIGINT << i)
       |           ELSE 0::BIGINT END)) AS BIGINT) AS w1
       |  FROM e
       |)""".stripMargin

  /** The asymmetric score in DuckDB over the SAME packed words the
    * Spark side scans (w0/w1 + the query's DOUBLE[] vector). */
  private def asymScoreSql(qv: String): String =
    s"""(CAST(list_sum(list_transform(range(0, $WordBits), i ->
       |  CASE WHEN ((c.w0 >> i) & 1)
       |         = (CASE WHEN $qv[i+1] > 0 THEN 1 ELSE 0 END)
       |    THEN 0::BIGINT
       |    ELSE abs(CAST(round($qv[i+1] * 1e6) AS BIGINT)) END))
       | AS BIGINT)
       | + CAST(list_sum(list_transform(range(0, $WordBits), i ->
       |  CASE WHEN ((c.w1 >> i) & 1)
       |         = (CASE WHEN $qv[i+1+$WordBits] > 0 THEN 1 ELSE 0 END)
       |    THEN 0::BIGINT
       |    ELSE abs(CAST(round($qv[i+1+$WordBits] * 1e6) AS BIGINT))
       |  END)) AS BIGINT))""".stripMargin.replace("\n", " ")

  def bqScanOracleSql(qid: Long, nCand: Int, k: Int): String =
    s"""WITH $codesCte, q AS (
       |  SELECT v AS qv FROM c WHERE vec_id = $qid
       |), cand AS (
       |  SELECT c.vec_id, c.label, c.v, ${asymScoreSql("q.qv")} AS ascore
       |  FROM c, q WHERE c.vec_id <> $qid
       |  ORDER BY ascore ASC, c.vec_id ASC LIMIT $nCand
       |)
       |SELECT cand.vec_id, cand.label, cand.ascore,
       |  round(1.0 - list_dot_product(cand.v, q.qv)
       |    / (sqrt(list_dot_product(cand.v, cand.v))
       |       * sqrt(list_dot_product(q.qv, q.qv))), 6) AS dist
       |FROM cand, q
       |ORDER BY dist ASC, cand.vec_id ASC LIMIT $k""".stripMargin

  /** Quantizer-quality gate (mirrors [[ProductQuant.pqRecall]]):
    * recall@k of BOTH pure rankings — symmetric Hamming and the
    * asymmetric score, no refine — against the exact cosine top-k, per
    * query, in one batched job; the asym columns should dominate the
    * sym ones (that lift is WHY the serving path is asymmetric, and
    * this gate keeps it measured). Output (q_id, n_exact, sym_common,
    * asym_common, sym_micro, asym_micro). */
  def bqRecall(spark: SparkSession, dir: String, qids: Seq[Long],
      k: Int): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val c = CacheScope.cached(codes(emb))
    val qc = codes(emb).filter(col("vec_id").isin(qids: _*))
      .join(emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("qv")), "vec_id")
      .select(col("vec_id").as("q_id"), col("w0").as("qw0"),
        col("w1").as("qw1"), col("qv"))
    // scored feeds two ranked consumers (sym + asym windows) — cache it
    val scored = CacheScope.cached(c.crossJoin(broadcast(qc))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        hammingCol(col("w0"), col("w1"), col("qw0"), col("qw1"))
          .as("sym"),
        asymScore(col("w0"), col("w1"), col("qv")).as("asym")))
    def topk(rank: String): DataFrame = {
      val w = Window.partitionBy("q_id")
        .orderBy(col(rank).asc, col("vec_id").asc)
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("q_id"), col("vec_id"), lit(1L).as(s"${rank}_hit"))
    }
    // persisted exact ground truth (EvalCache — built once per corpus)
    val ex = Similarity.knnBatchGt(spark, dir, qids, k)
    ex.join(topk("sym"), Seq("q_id", "vec_id"), "left")
      .join(topk("asym"), Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("sym_hit"), lit(0L))).as("sym_common"),
        sum(coalesce(col("asym_hit"), lit(0L))).as("asym_common"))
      .select(col("q_id"), col("n_exact"), col("sym_common"),
        col("asym_common"),
        expr(s"sym_common * 1000000 div $k").as("sym_micro"),
        expr(s"asym_common * 1000000 div $k").as("asym_micro"))
      .orderBy(col("q_id").asc)
  }

  def bqRecallOracleSql(qids: Seq[Long], k: Int): String = {
    val inList = qids.mkString(", ")
    s"""WITH $codesCte, q AS (
       |  SELECT vec_id AS q_id, w0 AS qw0, w1 AS qw1, v AS qv FROM c
       |  WHERE vec_id IN ($inList)
       |), scored AS (
       |  SELECT q.q_id, c.vec_id, q.qv,
       |    CAST(bit_count(xor(c.w0, q.qw0))
       |       + bit_count(xor(c.w1, q.qw1)) AS INT) AS sym,
       |    ${asymScoreSql("q.qv")} AS asym
       |  FROM c, q WHERE c.vec_id <> q.q_id
       |), symr AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY sym ASC, vec_id ASC) AS rn FROM scored) x
       |  WHERE rn <= $k
       |), asymr AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY asym ASC, vec_id ASC) AS rn FROM scored) x
       |  WHERE rn <= $k
       |), ex AS (
       |  SELECT q_id, vec_id FROM (${Similarity.knnBatchOracleSql(qids, k)}) y
       |)
       |SELECT ex.q_id, count(*) AS n_exact,
       |  CAST(sum(CASE WHEN s.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS sym_common,
       |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS asym_common,
       |  CAST(sum(CASE WHEN s.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    * 1000000 // $k AS BIGINT) AS sym_micro,
       |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    * 1000000 // $k AS BIGINT) AS asym_micro
       |FROM ex
       |LEFT JOIN symr s ON s.q_id = ex.q_id AND s.vec_id = ex.vec_id
       |LEFT JOIN asymr a ON a.q_id = ex.q_id AND a.vec_id = ex.vec_id
       |GROUP BY ex.q_id ORDER BY ex.q_id ASC""".stripMargin
  }
}
