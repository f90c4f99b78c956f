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
  * Spark-first shape, driver-paced like GraphAnn's beam walk: the
  * matrix never materializes AND nothing ever shuffles at corpus
  * size. Each iteration is ONE scan — a projection computes
  * u = (x−μ)·v per row (a 64-term codegen'd expression; μ and v ride
  * as literals), and a 64-column combinable aggregate reduces
  * w_d = Σᵢ (x_{id}−μ_d)·uᵢ map-side. The 64-double w row is a
  * bounded collect (the graph_ann k-row pattern); the normalizer and
  * next v are driver arithmetic. Cost = (1 mean pass) + iters scans,
  * zero wide exchanges — the earlier long-format formulation paid 6
  * corpus shuffles per run and benched 14× its oracle; this one is the
  * shape a 100 TB solver actually uses (all-reduce of a fixed-width
  * gradient).
  */
object PcaPower {

  val Iters = 3

  /** (d, loading, lambda): the unit top eigenvector after [[Iters]]
    * power iterations on the CENTERED covariance, with λ = the final
    * iteration's ‖w‖. */
  def topComponent(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(col("embedding"))
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    def x(d: Int) = element_at(col("embedding"), d + 1).cast("double")

    val meanAggs = count(lit(1)).cast("double").as("n") +:
      (0 until dim).map(d => sum(x(d)).as(s"s$d"))
    val meanRow = emb.agg(meanAggs.head, meanAggs.tail: _*).head()
    val n = meanRow.getDouble(0)
    val mu = Array.tabulate(dim)(d => meanRow.getDouble(d + 1) / n)

    var v = Array.fill(dim)(0.125) // 1/sqrt(64) uniform seed
    var lambda = 0.0
    (1 to Iters).foreach { _ =>
      val u = (0 until dim)
        .map(d => (x(d) - lit(mu(d))) * lit(v(d)))
        .reduce(_ + _)
      val wAggs = (0 until dim).map(d =>
        sum((x(d) - lit(mu(d))) * col("u")).as(s"w$d"))
      val wRow = emb.select(col("embedding"), u.as("u"))
        .agg(wAggs.head, wAggs.tail: _*).head()
      val w = Array.tabulate(dim)(wRow.getDouble)
      lambda = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / lambda)
    }
    import spark.implicits._
    // HALF_UP to match both engines' round() (math.rint would tie to
    // even)
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    v.toSeq.zipWithIndex
      .map { case (l, d) => (d.toLong, r(l, 6), r(lambda, 3)) }
      .toDF("d", "loading", "lambda")
      .orderBy(col("d").asc)
  }

  /** The same unrolled recursion in DuckDB (zipped parallel unnests
    * give the long format; every shared frame is MATERIALIZED so the
    * chain doesn't re-evaluate multiplicatively). The relational
    * long-format formulation and the engine's fixed-width aggregate
    * formulation sum the same positive-curvature terms in different
    * orders; the round-6 gate absorbs the ~1e-12 fp slack exactly as
    * the rolling-window operators document. */
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
