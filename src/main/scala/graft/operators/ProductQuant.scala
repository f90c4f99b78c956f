package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Product quantization (Jégou, Douze & Schmid 2011) — the compression
  * leg of the ANN index family next to the IVF cell index
  * (Similarity.ensureIvfIndex) and int8 scalar quantization (Quantize):
  * split each 64-dim vector into M=8 subspaces of 8 dims, quantize each
  * subspace to its nearest of 16 deterministic codewords, store ONE
  * int code per subspace — 8 small ints instead of 64 floats (32x).
  * Search runs Asymmetric Distance Computation: a per-query lookup
  * table of subspace distances, then each row's approximate L2² is 8
  * table lookups + 7 adds; top candidates get an exact full-dim refine
  * (the FAISS IndexPQ + refine pattern).
  *
  * Determinism (what makes this oracle-gateable): codewords are the
  * subspace slices of the seed vectors (vec_id < 16 — same convention
  * as the IVF seed centroids); every L2² uses the dot-product identity
  * |a-b|² = a·a - 2 a·b + b·b with left-to-right double accumulation;
  * encode distances are rounded to 6 before the argmin (tiebreak:
  * lower code id); the ADC sum adds subspaces in fixed s=0..M-1 order.
  *
  * Scale shape: encoding is scan-local (the codebook rides along as a
  * 1 KB literal — no join, no shuffle) and persisted ONCE as a table
  * (`ensurePqTable`); a probe scans 9 small ints per row instead of 64
  * floats — at 100 TB that is the difference between a 25 TB and a
  * 0.8 TB scan — and refines only nCand rows against the full vectors.
  */
object ProductQuant {

  val M = 8      // subspaces
  val Dsub = 8   // dims per subspace
  val NCode = 16 // codewords per subspace (codes fit 4 bits)

  /** |a-b|² via the dot identity — both engines compute the same three
    * left-to-right dots, so the value is bit-identical. */
  private def l2sq(a: Column, b: Column): Column =
    Similarity.dot(a, a) - lit(2.0) * Similarity.dot(a, b) +
      Similarity.dot(b, b)

  private def sdot(a: Seq[Double], b: Seq[Double]): Double =
    a.lazyZip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }

  /** Codebook [m][code][dim]: subspace slices of the seed vectors,
    * collected driver-side (NCode rows — bounded like the IVF centroid
    * collect). */
  def codebook(spark: SparkSession, dir: String): Array[Array[Array[Double]]] = {
    val seeds = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < lit(NCode.toLong))
      .orderBy(col("vec_id").asc)
      .select(col("embedding").cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    Array.tabulate(M, NCode)((s, c) =>
      seeds(c).slice(s * Dsub, (s + 1) * Dsub))
  }

  /** Scan-local PQ encoding of every vector against a literal codebook:
    * (vec_id, label, codes[M]). Zero shuffles, zero joins. */
  def encode(spark: SparkSession, dir: String): DataFrame = {
    val cb = codebook(spark, dir)
    // per-(s,c) codeword self-dots, precomputed once driver-side — the
    // same left-to-right accumulation the oracle's list_dot_product does
    val cc = cb.map(_.map(cw => sdot(cw, cw)))
    val v = col("embedding")
    val codeCols = (0 until M).map { s =>
      val subS = slice(v, s * Dsub + 1, Dsub)
      val daa = Similarity.dot(subS, subS)
      val best = aggregate(
        sequence(lit(0), lit(NCode - 1)),
        struct(lit(Double.MaxValue).as("d"), lit(-1).as("c")),
        (acc, ci) => {
          val cw = element_at(typedLit(cb(s).toSeq.map(_.toSeq)), ci + 1)
          val dcc = element_at(typedLit(cc(s).toSeq), ci + 1)
          val d = round(
            daa - lit(2.0) * Similarity.dot(subS, cw) + dcc, 6)
          when(d < acc("d"),
            struct(d.as("d"), ci.cast("int").as("c"))).otherwise(acc)
        })
      best("c").as(s"c$s")
    }
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        array(codeCols: _*).as("codes"))
  }

  /** Build-once: persist the PQ codes as a catalog table (the 32x-
    * smaller scan target every subsequent probe reads). Idempotent per
    * (dir); same convention as Similarity.ensureIvfIndex. A fresh
    * session sees tableExists=false while the managed location from a
    * previous session may still exist on disk — so, like
    * ScaleOps.writeBucketed, drop the catalog entry and remove an
    * orphaned location before writing (a bare saveAsTable would fail
    * with LOCATION_ALREADY_EXISTS on every session after the first). */
  def ensurePqTable(spark: SparkSession, dir: String): String = {
    val name = s"graft_pq_${ScaleOps.dirHash(dir)}"
    if (!spark.catalog.tableExists(name)) {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      graft.sources.ParquetStore.deleteRecursively(
        java.nio.file.Paths.get(warehouse, name.toLowerCase))
      encode(spark, dir).write.mode("overwrite").saveAsTable(name)
    }
    name
  }

  /** ADC scan + exact refine: approximate L2² from the code table, keep
    * nCand candidates, re-rank them by exact full-dim L2² against the
    * original vectors. Output (vec_id, label, adist, dist). */
  def pqScan(spark: SparkSession, dir: String, qid: Long, nCand: Int,
      k: Int): DataFrame = {
    val table = ensurePqTable(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    // ONE driver job fetches the codebook seeds AND the query vector
    // (seed-filter pushdown + point lookup) instead of two sequential
    // collects — the per-query driver-side floor is one scan, not two
    val fetched = emb
      .filter(col("vec_id") < lit(NCode.toLong) ||
        col("vec_id") === lit(qid))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val seeds = (0 until NCode).map(c => fetched(c.toLong))
    val cb = Array.tabulate(M, NCode)((s, c) =>
      seeds(c).slice(s * Dsub, (s + 1) * Dsub))
    val qv = fetched(qid)
    // per-query lookup table lut[s][c] = |q_s - cw_sc|²
    val lut = Array.tabulate(M, NCode) { (s, c) =>
      val qs = qv.slice(s * Dsub, (s + 1) * Dsub).toSeq
      val cw = cb(s)(c).toSeq
      sdot(qs, qs) - 2.0 * sdot(qs, cw) + sdot(cw, cw)
    }
    val lutLit = typedLit(lut.toSeq.map(_.toSeq))
    // fixed-order subspace sum: ((l0 + l1) + l2) ... — mirrored
    // textually in the oracle
    val adist = round(
      (0 until M)
        .map(s => element_at(element_at(lutLit, s + 1),
          element_at(col("codes"), s + 1) + 1))
        .reduce(_ + _), 6)
    val cand = spark.table(table)
      .filter(col("vec_id") =!= lit(qid))
      .select(col("vec_id"), col("label"), adist.as("adist"))
      .orderBy(col("adist").asc, col("vec_id").asc)
      .limit(nCand)
    // exact refine of the nCand survivors against the full vectors
    val qvLit = typedLit(qv.toSeq)
    broadcast(cand)
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("vec_id"), col("label"), col("adist"),
        round(l2sq(col("embedding"), qvLit), 6).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(k)
  }

  def pqScanOracleSql(qid: Long, nCand: Int, k: Int): String = {
    // ds[1] + ds[2] + ... — the same fixed-order add chain as the
    // Spark-side reduce
    val adcChain = (1 to M).map(i => s"ds[$i]").mkString(" + ")
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings
       |), subs AS (
       |  SELECT s FROM generate_series(0, ${M - 1}) AS g(s)
       |), cb AS (
       |  SELECT subs.s AS s, e.vec_id AS c,
       |    list_slice(e.v, subs.s * $Dsub + 1, (subs.s + 1) * $Dsub) AS cw
       |  FROM e, subs WHERE e.vec_id < $NCode
       |), enc0 AS (
       |  SELECT e.vec_id, e.label, cb.s, cb.c,
       |    round(
       |      list_dot_product(list_slice(e.v, cb.s * $Dsub + 1,
       |                                  (cb.s + 1) * $Dsub),
       |                       list_slice(e.v, cb.s * $Dsub + 1,
       |                                  (cb.s + 1) * $Dsub))
       |      - 2 * list_dot_product(list_slice(e.v, cb.s * $Dsub + 1,
       |                                        (cb.s + 1) * $Dsub), cb.cw)
       |      + list_dot_product(cb.cw, cb.cw), 6) AS d
       |  FROM e, cb
       |), enc AS (
       |  SELECT vec_id, label, s, c,
       |    row_number() OVER (PARTITION BY vec_id, s
       |                       ORDER BY d ASC, c ASC) AS rn
       |  FROM enc0
       |), q AS (
       |  SELECT v AS qv FROM e WHERE vec_id = $qid
       |), lut AS (
       |  SELECT cb.s, cb.c,
       |    list_dot_product(list_slice(qv, cb.s * $Dsub + 1,
       |                                (cb.s + 1) * $Dsub),
       |                     list_slice(qv, cb.s * $Dsub + 1,
       |                                (cb.s + 1) * $Dsub))
       |    - 2 * list_dot_product(list_slice(qv, cb.s * $Dsub + 1,
       |                                      (cb.s + 1) * $Dsub), cb.cw)
       |    + list_dot_product(cb.cw, cb.cw) AS d
       |  FROM cb, q
       |), adist0 AS (
       |  SELECT enc.vec_id, enc.label, list(lut.d ORDER BY enc.s) AS ds
       |  FROM enc JOIN lut ON lut.s = enc.s AND lut.c = enc.c
       |  WHERE enc.rn = 1
       |  GROUP BY enc.vec_id, enc.label
       |), cand AS (
       |  SELECT vec_id, label, round($adcChain, 6) AS adist
       |  FROM adist0 WHERE vec_id <> $qid
       |  ORDER BY adist ASC, vec_id ASC LIMIT $nCand
       |)
       |SELECT c.vec_id, c.label, c.adist,
       |  round(list_dot_product(e.v, e.v)
       |    - 2 * list_dot_product(e.v, qv)
       |    + list_dot_product(qv, qv), 6) AS dist
       |FROM cand c JOIN e ON e.vec_id = c.vec_id, q
       |ORDER BY dist ASC, c.vec_id ASC LIMIT $k""".stripMargin
  }
}
