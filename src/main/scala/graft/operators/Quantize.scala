package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Int8 scalar quantization of the embedding column — the standard
  * memory/bandwidth lever for vector search at scale (pgvector grew the
  * same capability for the reference's ivfflat index family,
  * /root/reference/scripts/init-db.sql:32; at 100 TB a float32 corpus
  * becomes 25 TB of int8 codes + one float scale per vector, and the
  * ANN probe's working set shrinks 4x).
  *
  * Scheme: symmetric per-vector max-abs scaling —
  *
  *   scale  = max_i |v_i|
  *   code_i = floor(v_i / scale * 127 + 0.5)  ∈ [-127, 127]
  *
  * Everything downstream of the codes is INTEGER arithmetic: code dot
  * products are exact (|Σ| ≤ 64·127² < 2^53), so cosine over the
  * dequantized vectors — where the scales cancel — is bit-identical in
  * any engine and any summation order. That is what makes this family
  * hash-gateable against DuckDB, and what makes the distance kernel
  * cheap on real hardware (SIMD int8 dot).
  *
  * Scale shape: quantization is scan-local (zero shuffles — one
  * projection over the embeddings scan); the KNN probe is the same
  * broadcast-one-row + TakeOrderedAndProject plan as exact KNN.
  */
object Quantize {

  private val Tiny = 1e-12 // all-zero-vector guard: codes become zeros

  /** Integer dot product of two int-code arrays, accumulated as LONG.
    * Backed by the native codegen'd [[graft.functions.IVecDot]] —
    * identical arithmetic to the former aggregate/zip_with fold, one
    * generated loop instead of per-element interpreted lambdas. */
  def idot(a: Column, b: Column): Column =
    call_function("ivec_dot", a, b)

  /** Scan-local quantization frame: (vec_id, label, scale, codes),
    * computed by the native codegen'd
    * [[graft.functions.QuantizeI8]] kernel — one generated loop per
    * row instead of ~128 interpreted HOF closures (the quantization
    * chain dominated knn_quantized/quant_stats bench time; the former
    * explode(array(...)) barrier against HOF re-evaluation is obsolete
    * because the struct-returning native call is subexpression-
    * eliminated by codegen like any deterministic expression). Same
    * arithmetic bit-for-bit; oracles unchanged. */
  def codes(emb: DataFrame): DataFrame = {
    val q = call_function("quantize_i8", col("embedding"))
    emb.select(
      col("vec_id"), col("label"),
      q.getField("scale").as("scale"),
      q.getField("codes").as("codes"))
  }

  /** KNN over the quantized codes: cosine distance of the dequantized
    * vectors (per-vector scales cancel, so only integer code dots
    * remain). Output (vec_id, label, dist) — the int8 analog of
    * Similarity.knnCosine. */
  def knnQuantized(spark: SparkSession, dir: String, qid: Long,
      k: Int): DataFrame = {
    val c = codes(Tables.embeddings(spark, dir))
    // norm guard mirrors the scale guard: an all-zero vector quantizes
    // to all-zero codes, and an unguarded 0/0 would give NaN dist whose
    // sort placement differs between engines
    val q = c.filter(col("vec_id") === lit(qid))
      .select(col("codes").as("qc"),
        greatest(sqrt(idot(col("codes"), col("codes")).cast("double")),
          lit(Tiny)).as("qn"))
    c.filter(col("vec_id") =!= lit(qid))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(
          lit(1.0) - idot(col("codes"), col("qc")).cast("double") /
            (greatest(
              sqrt(idot(col("codes"), col("codes")).cast("double")),
              lit(Tiny)) * col("qn")), 6).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(k)
  }

  def knnQuantizedOracleSql(qid: Long, k: Int): String =
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings
       |), s AS (
       |  SELECT vec_id, label, v,
       |    greatest(list_max(list_transform(v, x -> abs(x))),
       |             CAST($Tiny AS DOUBLE)) AS scale
       |  FROM e
       |), c AS (
       |  SELECT vec_id, label,
       |    CAST(list_transform(v,
       |      x -> CAST(floor(x / scale * 127 + 0.5) AS INT)) AS DOUBLE[])
       |      AS codes
       |  FROM s
       |), q AS (
       |  SELECT codes AS qc,
       |    greatest(sqrt(list_dot_product(codes, codes)),
       |             CAST($Tiny AS DOUBLE)) AS qn
       |  FROM c WHERE vec_id = $qid
       |)
       |SELECT vec_id, label,
       |  round(1.0 - list_dot_product(codes, qc)
       |    / (greatest(sqrt(list_dot_product(codes, codes)),
       |                CAST($Tiny AS DOUBLE)) * qn), 6) AS dist
       |FROM c, q WHERE vec_id <> $qid
       |ORDER BY dist ASC, vec_id ASC LIMIT $k""".stripMargin

  /** Per-label quantization audit — integer-exact except the scale
    * average: row count, total/extreme code values, saturated (=±127)
    * element count (≥ 1 per vector by construction: the max element),
    * mean scale. */
  def quantStats(spark: SparkSession, dir: String): DataFrame =
    codes(Tables.embeddings(spark, dir))
      .select(col("label"), col("scale"),
        aggregate(col("codes"), lit(0L),
          (acc, x) => acc + x.cast("long")).as("code_sum"),
        array_min(col("codes")).as("code_min"),
        array_max(col("codes")).as("code_max"),
        size(filter(col("codes"), x => abs(x) === lit(127)))
          .cast("long").as("n_sat"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n"),
        sum(col("code_sum")).as("sum_codes"),
        min(col("code_min")).as("min_code"),
        max(col("code_max")).as("max_code"),
        sum(col("n_sat")).as("saturated"),
        round(avg(col("scale")), 6).as("avg_scale"))
      .orderBy(col("label").asc)

  val quantStatsOracleSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings
       |), s AS (
       |  SELECT vec_id, label,
       |    greatest(list_max(list_transform(v, x -> abs(x))),
       |             CAST($Tiny AS DOUBLE)) AS scale,
       |    list_transform(v,
       |      x -> CAST(floor(x / (greatest(list_max(list_transform(v,
       |        y -> abs(y))), CAST($Tiny AS DOUBLE))) * 127 + 0.5)
       |        AS INT)) AS codes
       |  FROM e
       |)
       |SELECT label, count(*) AS n,
       |  CAST(sum(list_sum(codes)) AS BIGINT) AS sum_codes,
       |  min(list_min(codes)) AS min_code,
       |  max(list_max(codes)) AS max_code,
       |  CAST(sum(len(list_filter(codes, x -> abs(x) = 127))) AS BIGINT)
       |    AS saturated,
       |  round(avg(scale), 6) AS avg_scale
       |FROM s GROUP BY label ORDER BY label ASC""".stripMargin

  /** Quantization-family serving-recall gate — closes the gate matrix
    * so EVERY ANN/compression variant ships a measured quality number
    * (IVF→ann_recall, PQ→pq_recall, IVFPQ→ivfpq_recall, BQ→bq_recall,
    * and now int8 SQ + Matryoshka): recall@k per query of
    *
    *   sq  — the pure int8-cosine ranking (knn_quantized's serving
    *         path: quantization loss alone, no refine stage exists),
    *   mat — the Matryoshka serving path (dCoarse-dim prefix-cosine
    *         top-nCand pool → EXACT full-dim refine → top-k, exactly
    *         knn_matryoshka's plan),
    *
    * both against the exact full-dim cosine top-k. ONE corpus scan
    * computes all three distances per (query, vector) pair — the
    * Q-row query frame (full vector + int8 codes + prefix) broadcasts
    * into the scan, and every ranking is a q_id-keyed window; the
    * refine reuses the already-computed exact distance over the
    * nCand-bounded pool. */
  def quantRecall(spark: SparkSession, dir: String, qids: Seq[Long],
      dCoarse: Int, nCand: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
    def cn(c: Column): Column =
      greatest(sqrt(idot(c, c).cast("double")), lit(Tiny))
    def vn(v: Column): Column =
      greatest(sqrt(Similarity.dot(v, v)), lit(Tiny))
    // ONE projection off the embeddings scan: double vector + int8
    // codes + coarse prefix (a codes(emb) ⋈ emb self-join would pay a
    // corpus shuffle for columns the same scan already has in-row)
    val ev = col("embedding")
    val corpus = emb.select(
      col("vec_id"), ev.cast("array<double>").as("v"),
      call_function("quantize_i8", ev).getField("codes").as("codes"),
      slice(ev.cast("array<double>"), 1, dCoarse).as("vc"))
    val q = corpus.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("codes").as("qcodes"), col("vc").as("qvc"))
    val scored = CacheScope.cached(corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(lit(1.0) - idot(col("codes"), col("qcodes"))
          .cast("double") / (cn(col("codes")) * cn(col("qcodes"))), 6)
          .as("sq"),
        round(lit(1.0) - Similarity.dot(col("vc"), col("qvc"))
          / (vn(col("vc")) * vn(col("qvc"))), 6).as("cd"),
        round(lit(1.0) - Similarity.dot(col("v"), col("qv"))
          / (vn(col("v")) * vn(col("qv"))), 6).as("xd")))
    def w(rank: String) = Window.partitionBy("q_id")
      .orderBy(col(rank).asc, col("vec_id").asc)
    val sqTop = scored.withColumn("rn", row_number().over(w("sq")))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), lit(1L).as("sq_hit"))
    val matTop = scored.withColumn("rn", row_number().over(w("cd")))
      .filter(col("rn") <= nCand) // coarse pool
      .withColumn("rr", row_number().over(w("xd"))) // exact refine
      .filter(col("rr") <= k)
      .select(col("q_id"), col("vec_id"), lit(1L).as("mat_hit"))
    val exact = scored.withColumn("rn", row_number().over(w("xd")))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"))
    exact.join(sqTop, Seq("q_id", "vec_id"), "left")
      .join(matTop, Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("sq_hit"), lit(0L))).as("sq_common"),
        sum(coalesce(col("mat_hit"), lit(0L))).as("mat_common"))
      .select(col("q_id"), col("n_exact"), col("sq_common"),
        col("mat_common"),
        expr(s"sq_common * 1000000 div $k").as("sq_micro"),
        expr(s"mat_common * 1000000 div $k").as("mat_micro"))
      .orderBy(col("q_id").asc)
  }

  def quantRecallOracleSql(qids: Seq[Long], dCoarse: Int, nCand: Int,
      k: Int): String = {
    val inList = qids.mkString(", ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings
       |), c AS MATERIALIZED (
       |  SELECT vec_id, v,
       |    CAST(list_transform(v,
       |      x -> CAST(floor(x / (greatest(list_max(list_transform(v,
       |        y -> abs(y))), CAST($Tiny AS DOUBLE))) * 127 + 0.5)
       |        AS INT)) AS DOUBLE[]) AS codes,
       |    CAST(list_slice(v, 1, $dCoarse) AS DOUBLE[]) AS vc
       |  FROM e
       |), q AS (
       |  SELECT vec_id AS q_id, v AS qv, codes AS qcodes, vc AS qvc
       |  FROM c WHERE vec_id IN ($inList)
       |), scored AS MATERIALIZED (
       |  SELECT q.q_id, c.vec_id,
       |    round(1.0 - list_dot_product(c.codes, q.qcodes)
       |      / (greatest(sqrt(list_dot_product(c.codes, c.codes)),
       |           CAST($Tiny AS DOUBLE))
       |         * greatest(sqrt(list_dot_product(q.qcodes, q.qcodes)),
       |           CAST($Tiny AS DOUBLE))), 6) AS sq,
       |    round(1.0 - list_dot_product(c.vc, q.qvc)
       |      / (greatest(sqrt(list_dot_product(c.vc, c.vc)),
       |           CAST($Tiny AS DOUBLE))
       |         * greatest(sqrt(list_dot_product(q.qvc, q.qvc)),
       |           CAST($Tiny AS DOUBLE))), 6) AS cd,
       |    round(1.0 - list_dot_product(c.v, q.qv)
       |      / (greatest(sqrt(list_dot_product(c.v, c.v)),
       |           CAST($Tiny AS DOUBLE))
       |         * greatest(sqrt(list_dot_product(q.qv, q.qv)),
       |           CAST($Tiny AS DOUBLE))), 6) AS xd
       |  FROM c, q WHERE c.vec_id <> q.q_id
       |), sqr AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY sq ASC, vec_id ASC) AS rn FROM scored) x
       |  WHERE rn <= $k
       |), pool AS (
       |  SELECT q_id, vec_id, xd FROM (
       |    SELECT q_id, vec_id, xd, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cd ASC, vec_id ASC) AS rn FROM scored) x
       |  WHERE rn <= $nCand
       |), matr AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY xd ASC, vec_id ASC) AS rn FROM pool) x
       |  WHERE rn <= $k
       |), ex AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY xd ASC, vec_id ASC) AS rn FROM scored) x
       |  WHERE rn <= $k
       |)
       |SELECT ex.q_id, count(*) AS n_exact,
       |  CAST(sum(CASE WHEN s.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS sq_common,
       |  CAST(sum(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS mat_common,
       |  CAST(sum(CASE WHEN s.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    * 1000000 // $k AS BIGINT) AS sq_micro,
       |  CAST(sum(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    * 1000000 // $k AS BIGINT) AS mat_micro
       |FROM ex
       |LEFT JOIN sqr s ON s.q_id = ex.q_id AND s.vec_id = ex.vec_id
       |LEFT JOIN matr m ON m.q_id = ex.q_id AND m.vec_id = ex.vec_id
       |GROUP BY ex.q_id ORDER BY ex.q_id ASC""".stripMargin
  }
}
