package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Plan-fact regression pinning (r14 verdict #8): PLANS.md carries the
  * promised plans as prose and PlanLintSpec bans anti-patterns, but
  * neither notices a LOST broadcast or a NEW shuffle in a headline
  * query — a silent plan regression only surfaces as a bench diff a
  * round later. This spec pins the exact (shuffle-exchange count,
  * broadcast-exchange count, partition-pruned-scan presence) triple
  * for the headline queries, so a plan change fails `sbt test` by name
  * the moment it happens. Counts are over `queryExecution.sparkPlan`
  * (the pre-AQE physical plan — deterministic at planning time,
  * independent of runtime stats).
  *
  * When a pinned fact changes ON PURPOSE (an optimization lands),
  * update the table here AND the matching PLANS.md entry in the same
  * commit — the pair is the documented plan contract.
  */
class PlanFactsSpec extends SparkSpec {

  private case class Facts(shuffles: Int, broadcasts: Int,
      prunedScan: Boolean)

  private def all(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(all)) ++ p.subqueries.flatMap(all)

  private def factsOf(name: String): Facts = {
    // exchanges are inserted by the EnsureRequirements preparation, so
    // count on executedPlan; AQE is disabled for the probe so the plan
    // is the deterministic planning-time one (AdaptiveSparkPlanExec
    // hides its inner plan from children traversal and re-plans at
    // runtime — the opposite of a pinnable fact)
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val qe = SparkEntry.queries(name)(spark, Sf0001).queryExecution
      val nodes = all(qe.executedPlan)
      Facts(
        nodes.count(_.isInstanceOf[ShuffleExchangeExec]),
        nodes.count(_.isInstanceOf[BroadcastExchangeExec]),
        nodes.exists {
          case s: FileSourceScanExec => s.partitionFilters.nonEmpty
          case _ => false
        })
    } finally spark.conf.set(key, prev)
  }

  // The pinned contract: query -> (shuffles, broadcasts, pruned scan).
  // Derived from the r15 plans; rationale for each lives in PLANS.md.
  private val pinned: Map[String, Facts] = Map(
    // F5/F6 flagship: term-bucketed index probe + rarest-first all-terms
    // join rides the BUCKETED layout (no exchange, no broadcast needed),
    // scoped documents read prunes at the directory level,
    // TakeOrderedAndProject for the top-k — ZERO exchanges end to end
    "fts_topk" -> Facts(0, 0, true),
    // collection-scoped keyset pagination rides the partitioned layout;
    // offset+limit fold into the ordered take — zero exchanges
    "s3_pagination_scoped" -> Facts(0, 0, true),
    // bucketed fact-fact join: ZERO shuffle exchanges is the whole
    // point; the one broadcast is the tiny dim ride
    "bucketed_revenue" -> Facts(0, 1, false),
    // single-query IVF probe: static bucket pruning on the persisted
    // index, TakeOrderedAndProject — zero exchanges, zero broadcasts
    "ivf_ann" -> Facts(0, 0, false),
    // batched IVF serving, Q queries one job: probe-pair broadcast +
    // codes-side broadcast, per-query top-k window shuffle + the
    // grouped take + ordered output — the Q-independent exchange set
    "ivf_batch" -> Facts(3, 2, false),
    // brute-force cosine top-k: one broadcast (query-vector ride),
    // zero shuffles (TakeOrderedAndProject)
    "knn_cosine" -> Facts(0, 1, false),
    // MinHash+LSH banding over the PERSISTED band index (r15): joins
    // are UNHINTED — real table stats self-correct with scale, so at
    // THIS fixture's size the planner broadcasts one (genuinely tiny)
    // side and pays one band-key exchange; at corpus scale the same
    // stats exceed the threshold and the join exchanges instead
    "dedup_minhash" -> Facts(1, 1, false),
    // TPC-H Q3 shape: both dims broadcast, one aggregate exchange,
    // top-k via TakeOrderedAndProject (no sort exchange)
    "q3_shipping" -> Facts(1, 2, false),
    // tumbling windows: the window aggregate exchange + the ordered
    // output's range exchange
    "events_tumbling" -> Facts(2, 0, false),
    // Gopher gate rollup: scan-local signals, source-grain aggregate
    // exchange + ordered output
    "quality_gopher" -> Facts(2, 0, false),
    // compacted-generation probe: identical plan shape to ivf_ann —
    // static bucket pruning, TakeOrderedAndProject, NO tombstone
    // anti-join anywhere (that absence is the compaction win)
    "ivf_ann_compacted" -> Facts(0, 0, false),
    // vacuumed index stats: term-bucketed scan satisfies the groupBy
    // distribution — vocabulary aggregate with zero exchanges
    "fts_vacuum_termstats" -> Facts(0, 0, false),
    // hierarchical-fit gate as a PROBE over the persisted fit tables:
    // sizes aggregate off the assign table (1 exchange) + energy off
    // the cluster-bucketed cent table (0 — bucketing satisfies the
    // groupBy) + ordered output; the k1·k2-row energy side broadcasts
    // into the join — no Lloyd rounds in the plan at all
    "kmeans_hier" -> Facts(2, 1, false))

  test("headline queries keep their pinned (shuffles, broadcasts, " +
      "pruned-scan) plan facts") {
    val diffs = pinned.toSeq.sortBy(_._1).flatMap { case (name, want) =>
      val got = factsOf(name)
      graft.operators.CacheScope.release(spark)
      if (got != want)
        Some(s"$name: pinned $want, planned $got")
      else None
    }
    assert(diffs.isEmpty,
      s"plan-fact regressions (update PLANS.md + the pin if " +
        s"intentional):\n${diffs.mkString("\n")}")
  }
}
