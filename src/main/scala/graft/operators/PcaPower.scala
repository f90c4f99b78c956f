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
  * Spark-first shape: ONE corpus scan computes the raw second-moment
  * upper triangle M_de = Σᵢ x_id·x_ie plus the per-dim sums and count —
  * the all-reduce a 100 TB Gram computation actually is. The
  * accumulation runs as a per-partition fixed-width double[] kernel
  * (mapPartitions — the justified imperative class: expressing the
  * dim(dim+1)/2 products as 2 000+ individual aggregate COLUMNS was
  * measured at ~6 s of pure per-run analysis/codegen overhead at
  * dim=64, 25× the data cost; MLlib's covariance uses this same
  * per-partition BLAS-accumulator shape). Each partition emits one
  * (n, s, M) partial; the ≤numPartitions×(dim²/2+dim+1)-double collect
  * is the graph_ann bounded-collect pattern. The centered covariance
  * C = M − s·sᵀ/n is then a dim×dim driver matrix and ALL power
  * iterations are driver arithmetic on it: the round-1..3 recurrence
  * costs nothing and pays the Spark action floor exactly once instead
  * of once per round (r13 shape: 1 mean pass + 3 iteration scans = 4
  * actions, 0.91s at sf0.1 — 7.5× its oracle purely in job floor).
  *
  * Cross-engine fp: both engines center via M − s·sᵀ/n (same
  * cancellation structure), differing only in summation order; the
  * round-6 loading / round-3 λ gate absorbs the ~1e-12 relative slack
  * exactly as the rolling-window operators document.
  */
object PcaPower {

  val Iters = 3

  /** Driver Gram bound: dim² doubles collected once. 64-dim fixture →
    * 4096 cells; the require keeps anyone from pointing this at a
    * 4096-dim corpus where the one-pass aggregate column count
    * (dim²/2) would blow planning — past this, switch to the blocked
    * outer-product aggregation a real wide-dim solver uses. */
  val MaxGramDim = 256

  /** (d, loading, lambda): the unit top eigenvector after [[Iters]]
    * power iterations on the CENTERED covariance, with λ = the final
    * iteration's ‖w‖. */
  def topComponent(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // one scan: each partition accumulates (n, s_d, M upper triangle)
    // into fixed-width double arrays and emits ONE partial row
    val partials = Tables.embeddings(spark, dir)
      .select(col("embedding").cast("array<double>"))
      .as[Seq[Double]]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          val dim = first.length
          require(dim <= MaxGramDim,
            s"dim=$dim exceeds MaxGramDim=$MaxGramDim: the one-pass " +
              "Gram collect is bounded by dim^2 driver doubles")
          val s = new Array[Double](dim)
          val m = new Array[Double](dim * (dim + 1) / 2)
          var n = 0.0
          def acc(v: Seq[Double]): Unit = {
            n += 1.0
            var d = 0
            var i = 0
            while (d < dim) {
              val xd = v(d)
              s(d) += xd
              var e = d
              while (e < dim) { m(i) += xd * v(e); i += 1; e += 1 }
              d += 1
            }
          }
          acc(first)
          it.foreach(acc)
          Iterator((n, s.toSeq, m.toSeq))
        }
      }
      .collect()
    require(partials.nonEmpty, "no embeddings")
    val dim = partials.head._2.length
    val n = partials.map(_._1).sum
    val s = Array.tabulate(dim)(d => partials.map(_._2(d)).sum)
    val g = Array.ofDim[Double](dim, dim)
    var i = 0
    for (d <- 0 until dim; e <- d until dim) {
      val cg = partials.map(_._3(i)).sum - s(d) * s(e) / n
      g(d)(e) = cg
      g(e)(d) = cg
      i += 1
    }

    var v = Array.fill(dim)(0.125) // 1/sqrt(64) uniform seed
    var lambda = 0.0
    (1 to Iters).foreach { _ =>
      val w = Array.tabulate(dim) { d =>
        var acc = 0.0
        var e = 0
        while (e < dim) { acc += g(d)(e) * v(e); e += 1 }
        acc
      }
      lambda = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / lambda)
    }
    import spark.implicits._
    // HALF_UP to match both engines' round() (math.rint would tie to
    // even)
    def r(x: Double, sc: Int) =
      BigDecimal(x).setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
    v.toSeq.zipWithIndex
      .map { case (l, d) => (d.toLong, r(l, 6), r(lambda, 3)) }
      .toDF("d", "loading", "lambda")
      .orderBy(col("d").asc)
  }

  /** The same Gram-form recurrence in DuckDB: M from the long-format
    * self-join on vec_id, centering via M − s·sᵀ/n, then the three
    * iterations as dim×dim CTE joins (trivially small). Every shared
    * frame is MATERIALIZED so the chain doesn't re-evaluate
    * multiplicatively. */
  val topComponentOracleSql: String =
    """WITH long AS MATERIALIZED (
      |  SELECT vec_id,
      |    unnest(range(0, len(embedding))) AS d,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings
      |), stats AS MATERIALIZED (
      |  SELECT d, sum(x) AS s FROM long GROUP BY d
      |), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
      |m AS MATERIALIZED (
      |  SELECT a.d AS d1, b.d AS d2, sum(a.x * b.x) AS m
      |  FROM long a JOIN long b USING (vec_id)
      |  GROUP BY 1, 2
      |), g AS MATERIALIZED (
      |  SELECT d1, d2, m.m - sa.s * sb.s / nn.n AS g
      |  FROM m JOIN stats sa ON sa.d = m.d1
      |  JOIN stats sb ON sb.d = m.d2, nn
      |), v0 AS (
      |  SELECT d, 0.125 AS v FROM stats
      |), w1 AS MATERIALIZED (
      |  SELECT d1 AS d, sum(g * v) AS w FROM g JOIN v0 ON v0.d = g.d2
      |  GROUP BY 1
      |), n1 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w1),
      |v1 AS (SELECT d, w / nrm AS v FROM w1, n1),
      |w2 AS MATERIALIZED (
      |  SELECT d1 AS d, sum(g * v) AS w FROM g JOIN v1 ON v1.d = g.d2
      |  GROUP BY 1
      |), n2 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w2),
      |v2 AS (SELECT d, w / nrm AS v FROM w2, n2),
      |w3 AS MATERIALIZED (
      |  SELECT d1 AS d, sum(g * v) AS w FROM g JOIN v2 ON v2.d = g.d2
      |  GROUP BY 1
      |), n3 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w3)
      |SELECT CAST(d AS BIGINT) AS d,
      |  round(w / nrm, 6) AS loading,
      |  round(nrm, 3) AS lambda
      |FROM w3, n3
      |ORDER BY d ASC""".stripMargin
}
