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

  /** Scan-local quantization frame: (vec_id, label, scale, codes). */
  def codes(emb: DataFrame): DataFrame = {
    val v = col("embedding")
    val scale = greatest(
      array_max(transform(v, x => abs(x.cast("double")))), lit(Tiny))
    emb.select(
      col("vec_id"), col("label"), scale.as("scale"),
      transform(v, x =>
        floor(x.cast("double") / scale * lit(127.0) + lit(0.5))
          .cast("int")).as("codes"))
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
}
