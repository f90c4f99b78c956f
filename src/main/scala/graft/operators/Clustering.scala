package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding-space clustering — the SemDeDup shape (Abbas et al. 2023:
  * k-means the corpus embeddings, then look for near-duplicate pairs
  * only WITHIN a cluster, turning an O(n²) all-pairs search into
  * per-cluster work). The reference stops at per-query ANN
  * (/root/reference/src/core/vector_store.py search path); this is the
  * corpus-curation counterpart built on the same vectors.
  *
  * Determinism across engines is the whole design: embeddings are
  * quantized ONCE to integer micro-units (round(x·1e6) — the same
  * half-away-from-zero rounding in Spark and DuckDB), and every
  * downstream step is BIGINT arithmetic: distances are integer
  * squared-euclidean sums, the argmin key is dist·k + cluster (exact
  * composite, no window), centroid updates are sum-div-count integral
  * division. k-means on doubles would diverge across engines in one
  * iteration; k-means on integers is bit-reproducible anywhere.
  *
  * Scale shape (100 TB): per Lloyd round, assignment is SCAN-LOCAL —
  * the k·dim centroid matrix rides into the scan as a literal (bounded
  * by the broadcastability policy) and each vector computes its argmin
  * in one projection; the only exchange is the (cluster, dim)
  * centroid-update groupBy, partial-aggregable. Seed selection is a
  * k-row driver collect (same boundedness). The within-cluster pair
  * scan is the SemDeDup contract: clusters bound the quadratic term
  * (k chosen so n/k vectors fit a partition; skewed clusters would
  * re-shard by a salted sub-cluster pass).
  */
object Clustering {

  val Iterations = 3

  /** (vec_id, dim, q): embeddings exploded to quantized micro-unit
    * components. */
  private def ivec(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddingsDense(spark, dir)
      .select(col("vec_id"), posexplode(
        transform(col("embedding"),
          x => round(x.cast("double") * 1e6).cast("long"))))
      .toDF("vec_id", "dim", "q")

  /** Final (vec_id, cluster) assignment plus the final centroid rows
    * (cluster, dim, c), after `Iterations` Lloyd rounds from k
    * hash-spread (min-md5) seed vectors.
    *
    * Physical strategy (round 10): the assignment step is SCAN-LOCAL.
    * The centroid matrix (k·dim longs — bounded by the same
    * broadcastability policy the seed collect already assumes; ~10⁴
    * values at the fixture's k) rides into the scan as an
    * array-of-arrays literal, and each vector computes its k distances
    * + integer argmin key inside one projection — no vecs⋈centroids
    * join, which materialized n·dim·k rows through two shuffles per
    * Lloyd round (the sf-ladder run measured semdedup_report at 30× for
    * 10× data on that plan; assignment was the quadratic term since
    * k ∝ n). Per round there is now exactly ONE exchange (the
    * (cluster, dim) centroid-update groupBy over n·dim rows), and the
    * update is collected (k·dim rows) to seed the next round's literal.
    * Arithmetic is unchanged — same integer Σ(q−c)², same
    * dist·k+cluster argmin composite, same sum-div-count update — so
    * the DuckDB oracle (fitSql) is untouched and results stay
    * bit-identical. */
  private def fit(spark: SparkSession, dir: String,
      k: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val (assign, centM) = fitRaw(spark, dir, k)
    val centRows = centM.toSeq.zipWithIndex.flatMap { case (cs, c) =>
      cs.toSeq.zipWithIndex.map { case (v, j) =>
        Row(c.toLong, j, v)
      }
    }
    val centSchema = StructType(Seq(
      StructField("cluster", LongType, nullable = false),
      StructField("dim", IntegerType, nullable = false),
      StructField("c", LongType, nullable = false)))
    val cent = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(centRows).asJava,
      centSchema)
    (assign, cent)
  }

  /** The trained centroid matrix [cluster][dim] in integer micro units —
    * the final state after `iterations` Lloyd rounds. Exposed for the
    * IVF family (graft.operators.Similarity), whose coarse quantizer is
    * trained by this same bit-reproducible integer k-means (its DuckDB
    * oracles replay [[fitSqlFor]] and read `cent$iterations`).
    *
    * `spherical = true` renormalizes every centroid to unit micro norm
    * (1e6) after each integral-mean update — spherical k-means (Dhillon
    * & Modha 2001), the variant that matches a COSINE consumer: with
    * all centroids on the same sphere, the integer L2 argmin inside the
    * Lloyd loop coincides with the cosine argmin the IVF assignment and
    * probe use, so training optimizes the metric the index serves.
    * The renorm is round(c/|c|·1e6) with |c| an exact-integer sqrt —
    * the same correctly-rounded IEEE ops in Spark and DuckDB. */
  def trainedCentroidsMicro(spark: SparkSession, dir: String, k: Int,
      iterations: Int = Iterations,
      spherical: Boolean = false): Array[Array[Long]] =
    fitRaw(spark, dir, k, iterations, spherical)._2

  /** round-half-away-from-zero — SQL round() semantics (Math.round
    * floors ties, which differs on negatives). */
  private def roundHalfAway(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def renormalized(cm: Array[Array[Long]]): Array[Array[Long]] =
    cm.map { cs =>
      val nrm = math.sqrt(cs.foldLeft(0.0)((s, c) => s + c.toDouble * c))
      if (nrm == 0.0) cs.clone
      else cs.map(c => roundHalfAway(c.toDouble / nrm * 1e6))
    }

  /** Driver-side memo of the trained centroid matrices, keyed by
    * (corpus content fingerprint, k, iterations, spherical). The fit is
    * deterministic, so the matrices — NOT the assignment frame — are a
    * pure function of the key; a hit replays the final assignment as
    * ONE lazy scan-local pass instead of re-running `iterations` Lloyd
    * actions. Entry size is 2·k·dim longs, bounded by the
    * [[MaxDriverCentroidCells]] contract that gates every flat-fit
    * caller, so the memo can never outgrow what fitRaw itself holds
    * live. Content-fingerprint keying means an in-place fixture
    * regeneration starts a fresh entry (the ensureIndex discipline). */
  // Keyed by (dir, parameters), with the corpus fingerprint stored in
  // the value and checked on lookup: an IN-PLACE fixture regeneration
  // (same dir, new fingerprint) REPLACES the entry instead of
  // accumulating beside it — bounded eviction instead of the unbounded
  // fingerprint-keyed map (r15 ADVICE) — while a session alternating
  // between two fixture DIRS with the same parameters (sf0.1 then sf1
  // verify/bench in one JVM) keeps both entries live instead of
  // evicting each other on every call (r16 ADVICE; each refit is
  // `iterations` Lloyd actions). Live entries stay bounded by the
  // number of distinct fixture dirs a session touches (≤3 in practice),
  // each ≤ the MaxDriverCentroidCells contract.
  private val fitRawMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, Int, Boolean),
    (String, (Array[Array[Long]], Array[Array[Long]]))]

  private def fitRaw(spark: SparkSession, dir: String, k: Int,
      iterations: Int = Iterations,
      spherical: Boolean = false): (DataFrame, Array[Array[Long]]) = {
    val fp = ScaleOps.contentHash(dir, "embeddings")
    val memoKey = (dir, k, iterations, spherical)

    def assignFor(qarr: DataFrame,
        cm: Array[Array[Long]]): DataFrame = {
      val centLit = typedLit(cm.map(_.toSeq).toSeq)
      // scan-local distances + composite-key argmin fused in the native
      // kmeans_assign kernel (graft.functions.KMeansAssign) — the former
      // transform∘aggregate∘zip_with columns evaluated ~k·dim
      // interpreted closures per row and dominated the bench entry
      // (r16 verdict #4); the kernel replicates the exact integer math
      // and the dist·k+c tie-break, so assignments are bit-identical
      qarr.select(col("vec_id"),
        call_function("kmeans_assign", col("qa"), centLit)
          .getField("cluster").as("cluster"),
        col("qa"))
    }

    // (vec_id, qa): quantized embedding as one array column
    def quantized(): DataFrame = Tables.embeddingsDense(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1e6).cast("long")).as("qa"))

    val hit = fitRawMemo.get(memoKey)
    if (hit != null && hit._1 == fp) {
      // replay: the returned assignment is BY CONVENTION the one
      // computed from the PRE-update centroids of the final round
      // (fitSql's convention) — a single lazy scan, no actions here
      val (centPre, centFinal) = hit._2
      return (assignFor(quantized(), centPre)
        .select(col("vec_id"), col("cluster")), centFinal)
    }

    // cached for the Iterations+1 passes (rounds + final consumers)
    val qarr = quantized().transform(CacheScope.cached)
    val seedIds = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        md5(col("vec_id").cast("string").cast("binary")).as("h"))
      .orderBy(col("h").asc, col("vec_id").asc)
      .limit(k)
      .collect().map(_.getLong(0))
    val seedFrame = spark.createDataFrame(
        seedIds.toSeq.zipWithIndex.map { case (v, i) => (v, i.toLong) })
      .toDF("vec_id", "cluster")
    // centroid matrix, cluster-indexed (k rows × dim) — driver-side
    var centM: Array[Array[Long]] =
      qarr.join(broadcast(seedFrame), Seq("vec_id"))
        .select(col("cluster"), col("qa"))
        .collect()
        .sortBy(_.getLong(0))
        .map(_.getAs[scala.collection.Seq[Long]]("qa").toArray)

    var assign: DataFrame = null
    var centPre: Array[Array[Long]] = centM
    for (_ <- 1 to iterations) {
      centPre = centM
      val a = assignFor(qarr, centM)
      assign = a.select(col("vec_id"), col("cluster"))
      // integral-mean update; clusters that lost every vector keep
      // their previous centroid (fold over the collected k·dim sums).
      // The last round's update feeds the returned centroid frame.
      val sums = a
        .select(col("cluster"), posexplode(col("qa")).as(Seq("dim", "q")))
        .groupBy(col("cluster"), col("dim"))
        .agg(expr("sum(q) div count(1)").as("c_new"))
        .collect()
      val next = centM.map(_.clone)
      sums.foreach { r =>
        next(r.getLong(0).toInt)(r.getInt(1)) = r.getLong(2)
      }
      centM = if (spherical) renormalized(next) else next
    }
    fitRawMemo.put(memoKey, (fp, (centPre, centM)))
    (assign, centM)
  }

  /** Per-cluster summary: size and the centroid's integer energy
    * Σ c² — a checksum that pins the exact centroid without k·dim
    * output rows. */
  def kmeansClusters(spark: SparkSession, dir: String, k: Int): DataFrame = {
    // routed: flat kernel under the driver bound, hierarchical past it
    // (at fixture k this takes the flat route, which the oracle replays;
    // the hierarchical route has its own oracle, kmeans_hier)
    val (assignInline, cent) = kmeansAuto(spark, dir, k)
    // the assignment is a pure function of (corpus, k) — persist it
    // once per corpus generation (EvalCache discipline, the flat
    // sibling of ensureHierFit's `_assign` table) so the per-invocation
    // k×dim interpreted-lambda argmin scan becomes a one-time build and
    // every later call is a table probe (r16 job-floor pass)
    val assign = EvalCache.ensure(spark, dir, "embeddings",
      s"kasg$k", "cluster")(assignInline)
    val sizes = assign.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"))
    val energy = cent.groupBy(col("cluster"))
      .agg(sum(col("c") * col("c")).as("energy"))
    sizes.join(energy, Seq("cluster"))
      .select(col("cluster"), col("n_vecs"), col("energy"))
      .orderBy(col("cluster").asc)
  }

  /** SemDeDup report: within each final cluster, count vector pairs
    * closer than `maxDistMicro2` (integer squared micro-units) and
    * report the tightest pair's distance — the "how much near-dup mass
    * does each cluster hold" read a curation pass starts from.
    *
    * The scale contract is the K POLICY: k = max(8, n/targetClusterSize)
    * GROWS WITH THE CORPUS, so per-cluster all-pairs work is bounded by
    * targetClusterSize² regardless of n and the total pair scan is
    * O(n · targetClusterSize) — linear in corpus size. (SemDeDup, Abbas
    * et al. 2023, runs tens of thousands of clusters on billion-vector
    * corpora for exactly this reason; a FIXED k makes clusters ~n/k and
    * the pair scan O(n²) — the shape this replaced.) The count feeding k
    * is a parquet-metadata job, not a scan. Beyond
    * [[MaxDriverCentroidCells]] (k·dim ~10⁷) the flat kernel's driver
    * matrix outgrows memory; [[kmeansAuto]] routes that regime through
    * [[fitHierarchical]] — the two-level rung, implemented and oracled
    * (kmeans_hier). Skewed clusters re-shard by a salted sub-cluster
    * pass (see object doc). */
  def semdedupReport(spark: SparkSession, dir: String,
      targetClusterSize: Long, maxDistMicro2: Long): DataFrame = {
    val n = Similarity.embeddingsCount(spark, dir)
    val k = math.max(8L, n / targetClusterSize).toInt
    // This query is ORACLED against the FLAT fit (semdedupReportOracleSql
    // replays fitSqlForExpr): past the driver bound kmeansAuto would
    // route through fitHierarchical, whose output is NOT bit-equal to
    // flat at the same k — the gate would diverge by construction in
    // exactly the regime the routing targets. Fail loudly at the
    // boundary instead (r13 ADVICE); the hierarchical regime has its
    // own oracled entry (kmeans_hier / kmeansHierClustersOracleSql).
    require(k.toLong * 64 <= MaxDriverCentroidCells,
      s"semdedupReport k=$k crosses the flat-fit oracle boundary " +
        s"(MaxDriverCentroidCells=$MaxDriverCentroidCells); its DuckDB " +
        "oracle replays the flat fit only — use the hierarchical " +
        "family (kmeansHierClusters) past this point")
    val (assign, _) = kmeansAuto(spark, dir, k)
    val comps = ivec(spark, dir).join(assign, Seq("vec_id"))
      .transform(CacheScope.cached)
    val pairDists = comps.as("x")
      .join(comps.as("y"),
        col("x.cluster") === col("y.cluster") &&
          col("x.dim") === col("y.dim") &&
          col("x.vec_id") < col("y.vec_id"))
      .groupBy(col("x.cluster").as("cluster"),
        col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .agg(sum((col("x.q") - col("y.q")) * (col("x.q") - col("y.q")))
        .as("dist"))
    val close = pairDists
      .groupBy(col("cluster"))
      .agg(sum(when(col("dist") <= maxDistMicro2, 1L).otherwise(0L))
        .as("n_close_pairs"),
        min(col("dist")).as("min_dist"))
    assign.groupBy(col("cluster")).agg(count(lit(1)).as("n_vecs"))
      .join(close, Seq("cluster"), "left")
      .select(col("cluster"), col("n_vecs"),
        coalesce(col("n_close_pairs"), lit(0L)).as("n_close_pairs"),
        col("min_dist"))
      .orderBy(col("cluster").asc)
  }

  // ---- hierarchical (two-level) k-means ---------------------------------

  /** Flat-kernel ceiling: [[fitRaw]] keeps the k·dim centroid matrix on
    * the driver and collects k·dim update cells per Lloyd round — fine
    * to ~10⁷ cells, the documented boundary. Above it, [[kmeansAuto]]
    * routes through [[fitHierarchical]]. */
  val MaxDriverCentroidCells: Long = 10L * 1000 * 1000

  /** Two-level (hierarchical) k-means — the scale rung past the flat
    * kernel's driver boundary. Level 1 trains k1 ≈ √k coarse centroids
    * with the scan-local [[fitRaw]] (driver state k1·dim = √k·dim —
    * the bounded collect). Level 2 trains k2 sub-centroids WITHIN each
    * coarse cluster with NO driver state at all: the sub-centroid
    * frame stays distributed and each Lloyd round is
    * ivec ⋈ cent ON (coarse, dim) → per-vector argmin → integral-mean
    * update, all partial-aggregable exchanges. The join touches only
    * the vector's OWN coarse cluster's k2 rows, so per-round work is
    * n·dim·k2 = n·dim·√k — the hierarchical win over the flat
    * kernel's n·dim·k, on top of removing the driver bound entirely.
    * (The repo's perf lesson that driver-paced beats relational holds
    * for BOUNDED k; hierarchy exists precisely for k where the driver
    * matrix cannot exist.)
    *
    * Same bit-reproducible integer arithmetic as [[fitRaw]]: micro-unit
    * quantization, Σ(q−c)² BIGINT distances, dist·k2+sub argmin
    * composite, sum-div-count updates, empty sub-clusters keep their
    * previous centroid. Seeds: per coarse cluster, the k2 min-md5
    * vectors (row_number over a PARTITIONED window — no global
    * funnel). Final cluster id = coarse·k2 + sub.
    *
    * Returns (assign: vec_id → cluster, cent: cluster, dim, c) after
    * `iterations` rounds, with the fitSql convention that the returned
    * assignment is the one computed FROM the pre-update centroids of
    * the final round. */
  def fitHierarchical(spark: SparkSession, dir: String, k1: Int, k2: Int,
      iterations: Int = Iterations): (DataFrame, DataFrame) = {
    val (coarseAssign, _) = fitRaw(spark, dir, k1)
    // (vec_id, coarse, qa): ARRAY-form quantized vectors, repartitioned
    // by coarse ONCE and cached. Every per-round stage rides this single
    // partitioning: the cents join keys on coarse, and the update
    // groupBy (coarse, sub, dim) is satisfied by HashPartitioning
    // (coarse) — so after this one exchange, NO corpus-sized shuffle
    // happens in any Lloyd round (the r13 long-format shape paid two
    // n·dim·k2-row shuffles per round; bench kmeans_hier 2.9–3.2s was
    // mostly that).
    val ivcArr = Tables.embeddingsDense(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1e6).cast("long")).as("qa"))
      .join(coarseAssign.select(col("vec_id"),
        col("cluster").as("coarse")), Seq("vec_id"))
      .repartition(col("coarse"))
      .transform(CacheScope.cached)
    val byCoarse = org.apache.spark.sql.expressions.Window
      .partitionBy(col("coarse"))
      .orderBy(col("h").asc, col("vec_id").asc)
    val seeds = ivcArr.select(col("vec_id"), col("coarse"))
      .withColumn("h", md5(col("vec_id").cast("string").cast("binary")))
      .withColumn("rn", row_number().over(byCoarse))
      .filter(col("rn") <= k2)
      .select(col("vec_id"), col("coarse"),
        (col("rn") - 1).cast("long").as("sub"))
    // centroid state stays DISTRIBUTED in long format (coarse, sub,
    // dim, c) — k1·k2·dim rows, never on the driver; packed() derives
    // the per-coarse array form each round for the scan-local argmin.
    // Sub ids are contiguous 0..cellSeeds-1 per coarse cell and the
    // left-join/coalesce update keeps that key set stable across
    // rounds, so array position == sub id by construction.
    // eager localCheckpoint per round (the pagerankDups lesson): the
    // centroid frame is TINY (≤ k1·k2·dim rows), but left lazy the
    // round recurrence nests packed()+join trees `iterations` deep and
    // Catalyst pays seconds of analysis on the final action; a
    // checkpoint makes each round's plan start from a flat leaf
    var centLong: DataFrame = ivcArr.join(seeds, Seq("vec_id", "coarse"))
      .select(col("coarse"), col("sub"),
        posexplode(col("qa")).as(Seq("dim", "c")))
      .localCheckpoint(true)
    def packed(cl: DataFrame): DataFrame = cl
      .groupBy(col("coarse"), col("sub"))
      .agg(array_sort(collect_list(struct(col("dim"), col("c"))))
        .as("dc"))
      .select(col("coarse"), col("sub"),
        transform(col("dc"), s => s.getField("c")).as("carr"))
      .groupBy(col("coarse"))
      .agg(array_sort(collect_list(struct(col("sub"), col("carr"))))
        .as("sc"))
      .select(col("coarse"),
        transform(col("sc"), s => s.getField("carr")).as("cents"))
    // scan-local argmin against the row's OWN coarse cell's centroids —
    // same integer Σ(q−c)² distances and dist·k2+sub composite as the
    // long-format join computed, so the oracle is untouched. The cents
    // side is k1 rows: Catalyst broadcasts it while it is small and
    // falls back to a shuffle join when k1·k2·dim outgrows the
    // broadcast threshold — both keep the corpus side exchange-free
    // (broadcast joins shuffle nothing; shuffle joins reuse ivcArr's
    // coarse partitioning).
    def assignFor(cl: DataFrame): DataFrame = {
      // native kmeans_assign kernel over the row's OWN cents array —
      // the argmin index is the same whether the composite key
      // multiplies by k2 or by size(cents) (both exceed every tie
      // index), so this is the exact former dist·k2+sub assignment
      // without the interpreted per-element closures
      ivcArr.join(packed(cl), Seq("coarse"))
        .select(col("vec_id"), col("coarse"), col("qa"),
          call_function("kmeans_assign", col("qa"), col("cents"))
            .getField("cluster").as("sub"))
    }
    var assign: DataFrame = null
    for (_ <- 1 to iterations) {
      val a = assignFor(centLong).transform(CacheScope.cached)
      assign = a.select(col("vec_id"), col("coarse"), col("sub"))
      val sums = a
        .select(col("coarse"), col("sub"),
          posexplode(col("qa")).as(Seq("dim", "q")))
        .groupBy(col("coarse"), col("sub"), col("dim"))
        .agg(expr("sum(q) div count(1)").as("c_new"))
      centLong = centLong.as("p")
        .join(sums.as("s"), Seq("coarse", "sub", "dim"), "left")
        .select(col("coarse"), col("sub"), col("dim"),
          coalesce(col("c_new"), col("c")).as("c"))
        .localCheckpoint(true)
    }
    val a = assign.select(col("vec_id"),
      (col("coarse") * k2 + col("sub")).as("cluster"))
    val c = centLong.select((col("coarse") * k2 + col("sub")).as("cluster"),
      col("dim"), col("c"))
    (a, c)
  }

  private def hierFitName(dir: String, k1: Int, k2: Int): String =
    s"graft_hfit_${k1}x${k2}_${ScaleOps.contentHash(dir, "embeddings")}"

  /** Build-once / probe-many for the hierarchical fit: persist the
    * final (assignment, centroid) frames of [[fitHierarchical]] as
    * catalog tables keyed by corpus content fingerprint — the same
    * discipline every index family uses (the fit is deterministic, so
    * the tables are a pure function of the key). The level-2 Lloyd
    * rounds — the only corpus-scale work in the family — run ONCE per
    * corpus generation; every consumer (the kmeans_hier gate, the
    * hierarchical IVF build) is a probe over the stored frames.
    * Returns the table-name prefix (`_assign`: vec_id → cluster,
    * bucketed by vec_id for the index build's join back to the corpus;
    * `_cent`: (cluster, dim, c) long-format micro centroids, k1·k2·dim
    * rows — one file). */
  def ensureHierFit(spark: SparkSession, dir: String, k1: Int,
      k2: Int): String = {
    val name = hierFitName(dir, k1, k2)
    if (!spark.catalog.tableExists(s"${name}_assign")
        && !ScaleOps.attach(spark,
          s"${name}_cent" -> ("cluster", 1),
          s"${name}_assign" -> ("vec_id", 8))) {
      val (assign, cent) = fitHierarchical(spark, dir, k1, k2)
      // guard table (`_assign`) written LAST so an aborted build —
      // died between the two writes — re-runs instead of serving a
      // fit with no `_cent` companion (r15 ADVICE)
      ScaleOps.writeBucketed(cent, s"${name}_cent", "cluster", 1)
      ScaleOps.writeBucketed(assign, s"${name}_assign", "vec_id", 8)
    }
    name
  }

  /** Routed fit: flat kernel while the driver centroid matrix fits the
    * documented bound, hierarchical k1·k2 factorization past it. */
  def kmeansAuto(spark: SparkSession, dir: String, k: Int,
      dim: Int = 64): (DataFrame, DataFrame) =
    if (k.toLong * dim <= MaxDriverCentroidCells) fit(spark, dir, k)
    else {
      val k1 = math.ceil(math.sqrt(k.toDouble)).toInt
      val k2 = math.ceil(k.toDouble / k1).toInt
      fitHierarchical(spark, dir, k1, k2)
    }

  /** [[kmeansClusters]]' hierarchical sibling: per final-cluster size
    * and centroid energy under an explicit k1·k2 factorization — the
    * oracled fixture-scale exercise of the [[fitHierarchical]] path. */
  def kmeansHierClusters(spark: SparkSession, dir: String, k1: Int,
      k2: Int): DataFrame = {
    val fitTbl = ensureHierFit(spark, dir, k1, k2)
    val assign = spark.table(s"${fitTbl}_assign")
    val cent = spark.table(s"${fitTbl}_cent")
    val sizes = assign.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"))
    val energy = cent.groupBy(col("cluster"))
      .agg(sum(col("c") * col("c")).as("energy"))
    sizes.join(energy, Seq("cluster"))
      .select(col("cluster"), col("n_vecs"), col("energy"))
      .orderBy(col("cluster").asc)
  }

  /** Clustering-quality gate the family was missing (every ANN/dedup
    * variant has a registered quality gate; the k-means fit had only
    * size/energy checksums): per-cluster SIMPLIFIED SILHOUETTE on the
    * integer squared micro distances — a = own-centroid dist², b =
    * best other-centroid dist² (the second-smallest, since assignment
    * IS the argmin), s = (b−a)/max(a,b) ∈ [−1, 1] in exact micro
    * units. The squared-distance variant is documented (a monotone
    * transform of the classic centroid silhouette — same sign, same
    * ordering); everything stays BIGINT: distances are the fit's own
    * integer sums, a and b are pre-scaled `div 1024` for 64-bit
    * headroom ((b−a)·10⁶ at 64-dim micro-unit magnitudes would
    * overflow), the ratio is one integral division, the per-cluster
    * mean is sum-div-count — bit-identical across engines, no floats
    * anywhere.
    *
    * Scale shape: distances are scan-local against the k·dim literal
    * (the fitRaw broadcastability bound, guarded), staged through
    * explode(array(...)) barriers so the k-distance HOF evaluates
    * once per row; one vocabulary-sized groupBy. Output
    * (cluster, n_vecs, mean_silhouette_micro). */
  def kmeansSilhouette(spark: SparkSession, dir: String,
      k: Int): DataFrame = {
    require(k >= 2, "silhouette needs a second cluster")
    require(k.toLong * 64 <= MaxDriverCentroidCells,
      s"kmeansSilhouette k=$k crosses the flat-fit oracle boundary")
    val cm = trainedCentroidsMicro(spark, dir, k)
    val centLit = typedLit(cm.map(_.toSeq).toSeq)
    val qarr = Tables.embeddingsDense(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1e6).cast("long")).as("qa"))
    // distances + argmin in ONE native kmeans_assign pass (the same
    // kernel the fit uses — identical integer math and tie-break); the
    // explode(array(...)) barrier materializes the struct once per row
    val withD = qarr
      .select(col("vec_id"),
        explode(array(
          call_function("kmeans_assign", col("qa"), centLit))).as("asg"))
      .select(col("vec_id"), col("asg").getField("dists").as("dists"),
        col("asg").getField("cluster").as("cluster"))
    val bExpr = array_min(zip_with(col("dists"),
      sequence(lit(0L), lit((k - 1).toLong)),
      (dd, cc) => when(cc === col("cluster"), lit(Long.MaxValue))
        .otherwise(dd)))
    withD
      .select(col("cluster"),
        expr("element_at(dists, cast(cluster + 1 as int)) div 1024")
          .as("a"),
        bExpr.as("b0"))
      .select(col("cluster"), col("a"), expr("b0 div 1024").as("b_raw"))
      .select(col("cluster"),
        expr("(b_raw - a) * 1000000 div greatest(a, b_raw, 1)")
          .as("s_micro"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(s_micro) div count(1)").as("mean_silhouette_micro"))
      .orderBy(col("cluster").asc)
  }

  def kmeansSilhouetteOracleSql(k: Int,
      iterations: Int = Iterations): String =
    s"""WITH ${fitSqlFor(k)}, d AS MATERIALIZED (
       |  SELECT v.vec_id, c.cluster,
       |    sum((v.q - c.c) * (v.q - c.c)) AS dist
       |  FROM ivec v JOIN cent$iterations c ON c.dim = v.dim
       |  GROUP BY 1, 2
       |), pick AS MATERIALIZED (
       |  SELECT vec_id,
       |    CAST(min(dist * $k + cluster) % $k AS BIGINT) AS cluster,
       |    min(dist) // 1024 AS a
       |  FROM d GROUP BY vec_id
       |), bb AS (
       |  SELECT d.vec_id, min(d.dist) // 1024 AS b_raw
       |  FROM d JOIN pick p
       |    ON p.vec_id = d.vec_id AND d.cluster <> p.cluster
       |  GROUP BY 1
       |), s AS (
       |  SELECT p.cluster,
       |    (bb.b_raw - p.a) * 1000000 // greatest(p.a, bb.b_raw, 1)
       |      AS s_micro
       |  FROM pick p JOIN bb ON bb.vec_id = p.vec_id
       |)
       |SELECT cluster, count(*) AS n_vecs,
       |  CAST(sum(s_micro) // count(*) AS BIGINT)
       |    AS mean_silhouette_micro
       |FROM s GROUP BY cluster ORDER BY cluster ASC""".stripMargin

  def kmeansHierClustersOracleSql(k1: Int, k2: Int,
      iterations: Int = Iterations): String =
    s"""WITH ${hierFitSql(k1, k2, iterations)}
       |SELECT a.coarse * $k2 + a.sub AS cluster, count(*) AS n_vecs,
       |  (SELECT CAST(sum(c.c * c.c) AS BIGINT) FROM hcent$iterations c
       |   WHERE c.coarse = a.coarse AND c.sub = a.sub) AS energy
       |FROM hassign$iterations a
       |GROUP BY a.coarse, a.sub ORDER BY 1 ASC""".stripMargin

  /** The full two-level fit as a CTE chain — exposes
    * `hassign$iterations` (vec_id, coarse, sub) and `hcent$iterations`
    * (coarse, sub, dim, c in micro units). Shared by the kmeans_hier
    * gate and the hierarchical-IVF probe oracle
    * (Similarity.ivfTopKHierOracleSql), so the trained structure the
    * index persists and the structure the oracle replays can never
    * drift. */
  private[operators] def hierFitSql(k1: Int, k2: Int,
      iterations: Int = Iterations): String = {
    val iters = (1 to iterations).map { i =>
      s"""hdist$i AS (
         |  SELECT v.vec_id, v.coarse, c.sub,
         |    sum((v.q - c.c) * (v.q - c.c)) AS dist
         |  FROM ivc v JOIN hcent${i - 1} c
         |    ON c.coarse = v.coarse AND c.dim = v.dim
         |  GROUP BY 1, 2, 3
         |), hassign$i AS MATERIALIZED (
         |  SELECT vec_id, coarse,
         |    CAST(min(dist * $k2 + sub) % $k2 AS BIGINT) AS sub
         |  FROM hdist$i GROUP BY 1, 2
         |), hsums$i AS (
         |  SELECT a.coarse, a.sub, v.dim, sum(v.q) // count(*) AS c_new
         |  FROM ivc v JOIN hassign$i a ON a.vec_id = v.vec_id
         |  GROUP BY 1, 2, 3
         |), hcent$i AS MATERIALIZED (
         |  SELECT p.coarse, p.sub, p.dim,
         |    CAST(coalesce(s.c_new, p.c) AS BIGINT) AS c
         |  FROM hcent${i - 1} p LEFT JOIN hsums$i s
         |    ON s.coarse = p.coarse AND s.sub = p.sub AND s.dim = p.dim
         |)""".stripMargin
    }.mkString(", ")
    s"""${fitSql(k1.toString)}, ivc AS MATERIALIZED (
       |  SELECT v.vec_id, v.dim, v.q, a.cluster AS coarse
       |  FROM ivec v JOIN assign$iterations a ON a.vec_id = v.vec_id
       |), hseeds AS (
       |  SELECT vec_id, coarse, rn - 1 AS sub FROM (
       |    SELECT vec_id, coarse,
       |      row_number() OVER (PARTITION BY coarse
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC)
       |        AS rn
       |    FROM (SELECT DISTINCT vec_id, coarse FROM ivc)
       |  ) WHERE rn <= $k2
       |), hcent0 AS MATERIALIZED (
       |  SELECT s.coarse, s.sub, v.dim, v.q AS c
       |  FROM ivc v JOIN hseeds s ON s.vec_id = v.vec_id
       |), $iters""".stripMargin
  }

  // ---- oracle SQL ----

  private val IvecSql: String =
    """SELECT vec_id,
      |    generate_subscripts(embedding, 1) - 1 AS dim,
      |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
      |      AS q
      |  FROM embeddings""".stripMargin

  /** [[fitSql]] under a fixed k — the form the IVF-family oracles embed
    * to reproduce the trained coarse centroids (Similarity/IvfPq). */
  private[operators] def fitSqlFor(k: Int,
      iterations: Int = Iterations,
      spherical: Boolean = false): String =
    fitSql(k.toString, iterations, spherical)

  /** [[fitSql]] under an arbitrary BIGINT-valued k EXPRESSION (e.g. a
    * corpus-relative scalar subquery) — the IVF auto-cell-count oracle
    * uses this with the semdedup kpick pattern. */
  private[operators] def fitSqlForExpr(kSql: String,
      iterations: Int = Iterations,
      spherical: Boolean = false): String =
    fitSql(kSql, iterations, spherical)

  /** The shared fit: seeds, then `iterations` unrolled assign/update
    * CTE pairs. Exposes `assign$iterations` (vec_id, cluster) and
    * `cent$iterations` (cluster, dim, c). `kSql` is any BIGINT-valued
    * SQL expression — a literal for fixed-k callers, a scalar subquery
    * for the corpus-relative SemDeDup policy. `spherical` adds the
    * per-round centroid renormalization (the SQL twin of
    * [[trainedCentroidsMicro]]'s spherical mode — same exact-integer
    * sqrt, same half-away round). Heavily-referenced CTEs are
    * MATERIALIZED: DuckDB otherwise inlines a CTE per reference, which
    * re-evaluates the whole unrolled chain multiplicatively inside the
    * composed IVF/IVFPQ oracles (measured: 507 s → sub-second). */
  private def fitSql(kSql: String, iterations: Int = Iterations,
      spherical: Boolean = false): String = {
    val k = kSql
    val iters = (1 to iterations).map { i =>
      val update =
        if (!spherical)
          s"""cent$i AS MATERIALIZED (
             |  SELECT p.cluster, p.dim,
             |    CAST(coalesce(s.c_new, p.c) AS BIGINT) AS c
             |  FROM cent${i - 1} p LEFT JOIN sums$i s
             |    ON s.cluster = p.cluster AND s.dim = p.dim
             |)""".stripMargin
        else
          s"""centraw$i AS MATERIALIZED (
             |  SELECT p.cluster, p.dim,
             |    CAST(coalesce(s.c_new, p.c) AS BIGINT) AS c
             |  FROM cent${i - 1} p LEFT JOIN sums$i s
             |    ON s.cluster = p.cluster AND s.dim = p.dim
             |), cnorm$i AS (
             |  SELECT cluster, sqrt(sum(c * c)) AS nrm
             |  FROM centraw$i GROUP BY cluster
             |), cent$i AS MATERIALIZED (
             |  SELECT r.cluster, r.dim,
             |    CASE WHEN n.nrm = 0 THEN r.c
             |      ELSE CAST(round(r.c / n.nrm * 1e6) AS BIGINT)
             |    END AS c
             |  FROM centraw$i r JOIN cnorm$i n ON n.cluster = r.cluster
             |)""".stripMargin
      s"""dist$i AS (
         |  SELECT v.vec_id, c.cluster,
         |    sum((v.q - c.c) * (v.q - c.c)) AS dist
         |  FROM ivec v JOIN cent${i - 1} c ON c.dim = v.dim
         |  GROUP BY 1, 2
         |), assign$i AS MATERIALIZED (
         |  SELECT vec_id,
         |    CAST(min(dist * $k + cluster) % $k AS BIGINT) AS cluster
         |  FROM dist$i GROUP BY 1
         |), sums$i AS (
         |  SELECT a.cluster, v.dim, sum(v.q) // count(*) AS c_new
         |  FROM ivec v JOIN assign$i a ON a.vec_id = v.vec_id
         |  GROUP BY 1, 2
         |), $update""".stripMargin
    }.mkString(", ")
    s"""ivec AS MATERIALIZED (
       |  $IvecSql
       |), seeds AS (
       |  SELECT vec_id,
       |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC,
       |                       vec_id ASC) - 1 AS cluster
       |  FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT ($k)
       |), cent0 AS MATERIALIZED (
       |  SELECT s.cluster, v.dim, v.q AS c
       |  FROM ivec v JOIN seeds s ON s.vec_id = v.vec_id
       |), $iters""".stripMargin
  }

  def kmeansClustersOracleSql(k: Int): String =
    s"""WITH ${fitSql(k.toString)}
       |SELECT a.cluster, count(*) AS n_vecs,
       |  (SELECT CAST(sum(c.c * c.c) AS BIGINT) FROM cent$Iterations c
       |   WHERE c.cluster = a.cluster) AS energy
       |FROM assign$Iterations a
       |GROUP BY a.cluster ORDER BY a.cluster ASC""".stripMargin

  /** Oracle twin of the corpus-relative policy: DuckDB derives the SAME
    * k = greatest(8, n // targetClusterSize) from the table it scans. */
  def semdedupReportOracleSql(targetClusterSize: Long,
      maxDistMicro2: Long): String =
    s"""WITH kpick AS (
       |  SELECT greatest(8, count(*) // $targetClusterSize) AS kk
       |  FROM embeddings
       |), ${fitSql("(SELECT kk FROM kpick)")}, comps AS (
       |  SELECT v.vec_id, v.dim, v.q, a.cluster
       |  FROM ivec v JOIN assign$Iterations a ON a.vec_id = v.vec_id
       |), pd AS (
       |  SELECT x.cluster, x.vec_id AS a, y.vec_id AS b,
       |    sum((x.q - y.q) * (x.q - y.q)) AS dist
       |  FROM comps x JOIN comps y
       |    ON y.cluster = x.cluster AND y.dim = x.dim
       |      AND x.vec_id < y.vec_id
       |  GROUP BY 1, 2, 3
       |), cl AS (
       |  SELECT cluster,
       |    CAST(sum(CASE WHEN dist <= $maxDistMicro2 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_close_pairs,
       |    CAST(min(dist) AS BIGINT) AS min_dist
       |  FROM pd GROUP BY 1
       |)
       |SELECT a.cluster, count(*) AS n_vecs,
       |  coalesce(any_value(cl.n_close_pairs), 0) AS n_close_pairs,
       |  any_value(cl.min_dist) AS min_dist
       |FROM assign$Iterations a LEFT JOIN cl ON cl.cluster = a.cluster
       |GROUP BY a.cluster ORDER BY a.cluster ASC""".stripMargin
}
