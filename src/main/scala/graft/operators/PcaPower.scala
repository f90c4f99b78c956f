package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Top principal component of the embedding cloud by POWER ITERATION —
  * the embedding-space health diagnostic (an embedding model whose top
  * PC eats most of the variance has collapsed toward a line; serving
  * cosine on such a space degrades, and papers on representation
  * anisotropy recommend exactly this check). The reference stores
  * pgvector embeddings but ships no space diagnostics at all — this is
  * the beyond-reference monitoring layer for §2.3's vector surface.
  *
  * Spark-first shape: the matrix never materializes. Vectors live in
  * LONG format (vec_id, d, x) — one posexplode — and each iteration is
  * two relational contractions: u = X·v (join the 64-row v as a
  * broadcast, reduce per vec_id) and w = Xᵀ·u (join u back on vec_id,
  * reduce per dim, 64 rows out). The normalizer rides as a 1-row
  * broadcast. Three unrolled iterations from the uniform seed — all
  * engine-deterministic arithmetic, no RNG — and the oracle replays the
  * identical unrolled recursion in SQL.
  *
  * At 100 TB: every per-iteration reduce is map-side combinable, the
  * only all-data structure shuffled is the (d, partial-sum) pairs — 64
  * rows per partition — and the vec_id-keyed join reuses the exchange
  * the u-reduction just produced. Cost = iters × one corpus pass, the
  * same shape a distributed Lanczos/power solver has.
  */
object PcaPower {

  val Iters = 3

  /** (d, loading, lambda): the unit top eigenvector after [[Iters]]
    * power iterations on the CENTERED covariance, with the Rayleigh
    * estimate λ = ‖X·v‖-step norm of the final iteration. */
  def topComponent(spark: SparkSession, dir: String): DataFrame = {
    val long = CacheScope.cached(
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
        .select(col("vec_id"), col("d"),
          col("x").cast("double").as("x")))
    val means = long.groupBy("d")
      .agg((sum(col("x")) / count(lit(1))).as("mu"))
    val centered = CacheScope.cached(
      long.join(broadcast(means), Seq("d"))
        .select(col("vec_id"), col("d"), (col("x") - col("mu")).as("x")))
    val dims = means.select(col("d"))
    var v = dims.select(col("d"), lit(0.125).as("v")) // 1/sqrt(64)
    var lambda: DataFrame = null
    (1 to Iters).foreach { _ =>
      val u = centered.join(broadcast(v), Seq("d"))
        .groupBy("vec_id").agg(sum(col("x") * col("v")).as("u"))
      val w = centered.join(u, Seq("vec_id"))
        .groupBy("d").agg(sum(col("x") * col("u")).as("w"))
      lambda = w.agg(sqrt(sum(col("w") * col("w"))).as("lambda"))
      v = w.crossJoin(broadcast(lambda))
        .select(col("d"), (col("w") / col("lambda")).as("v"))
    }
    v.crossJoin(broadcast(lambda))
      .select(col("d").cast("long").as("d"),
        round(col("v"), 6).as("loading"),
        round(col("lambda"), 3).as("lambda"))
      .orderBy(col("d").asc)
  }

  /** The same unrolled recursion in DuckDB (zipped parallel unnests
    * give the long format; every shared frame is MATERIALIZED so the
    * chain doesn't re-evaluate multiplicatively). */
  val topComponentOracleSql: String =
    """WITH long AS MATERIALIZED (
      |  SELECT vec_id,
      |    unnest(range(0, len(embedding))) AS d,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings
      |), mu AS MATERIALIZED (
      |  SELECT d, sum(x) / count(*) AS mu FROM long GROUP BY d
      |), c AS MATERIALIZED (
      |  SELECT vec_id, long.d, x - mu AS x
      |  FROM long JOIN mu USING (d)
      |), v0 AS (
      |  SELECT d, 0.125 AS v FROM mu
      |), u1 AS MATERIALIZED (
      |  SELECT vec_id, sum(x * v) AS u FROM c JOIN v0 USING (d)
      |  GROUP BY vec_id
      |), w1 AS MATERIALIZED (
      |  SELECT d, sum(x * u) AS w FROM c JOIN u1 USING (vec_id)
      |  GROUP BY d
      |), n1 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w1),
      |v1 AS MATERIALIZED (SELECT d, w / nrm AS v FROM w1, n1),
      |u2 AS MATERIALIZED (
      |  SELECT vec_id, sum(x * v) AS u FROM c JOIN v1 USING (d)
      |  GROUP BY vec_id
      |), w2 AS MATERIALIZED (
      |  SELECT d, sum(x * u) AS w FROM c JOIN u2 USING (vec_id)
      |  GROUP BY d
      |), n2 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w2),
      |v2 AS MATERIALIZED (SELECT d, w / nrm AS v FROM w2, n2),
      |u3 AS MATERIALIZED (
      |  SELECT vec_id, sum(x * v) AS u FROM c JOIN v2 USING (d)
      |  GROUP BY vec_id
      |), w3 AS MATERIALIZED (
      |  SELECT d, sum(x * u) AS w FROM c JOIN u3 USING (vec_id)
      |  GROUP BY d
      |), n3 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w3)
      |SELECT CAST(d AS BIGINT) AS d,
      |  round(w / nrm, 6) AS loading,
      |  round(nrm, 3) AS lambda
      |FROM w3, n3
      |ORDER BY d ASC""".stripMargin
}
