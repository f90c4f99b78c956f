package graft

import graft.operators.{DriverMemo, Fts}

/** Proves the driver-memo discipline (r17 verdict #2): per-query
  * driver state stays BOUNDED under an unbounded stream of distinct
  * queries, generation flips replace instead of accumulate, and
  * alternating generations do not evict each other (r17 ADVICE,
  * probeMemo alternation).
  */
class MemoBoundSpec extends SparkSpec {

  test("a long stream of distinct keys leaves at most maxEntries live") {
    val memo = new DriverMemo[Int, Int](32)
    var computes = 0
    (0 until 10000).foreach { i =>
      memo.getOrCompute(i, "gen0") { computes += 1; i * 2 }
    }
    assert(memo.size == 32)
    assert(computes == 10000)
    // the most recent keys are the live ones (access-ordered LRU)
    var hits = 0
    (9968 until 10000).foreach { i =>
      memo.getOrCompute(i, "gen0") { hits -= 1000000; 0 }
    }
    assert(hits == 0, "recent keys must be served from the memo")
  }

  test("generation mismatch replaces in place; alternation keeps both") {
    val memo = new DriverMemo[String, Int](8)
    assert(memo.getOrCompute("q", "genA") { 1 } == 1)
    // stale-generation hit recomputes and REPLACES (no growth)
    assert(memo.getOrCompute("q", "genB") { 2 } == 2)
    assert(memo.size == 1)
    assert(memo.getOrCompute("q", "genB") { -1 } == 2)
    // generation-bearing keys (the index-name-in-key pattern) keep two
    // alternating fixtures live simultaneously — neither evicts the
    // other on a ping-pong access pattern
    var recomputes = 0
    (0 until 6).foreach { i =>
      val gen = if (i % 2 == 0) "idxA" else "idxB"
      memo.getOrCompute((gen, "terms").toString, gen) { recomputes += 1; i }
    }
    assert(recomputes == 2, "ping-pong between two generations must " +
      "compute once per generation, not once per call")
  }

  test("Fts df probe memo is wired through the bounded memo") {
    val idx = Fts.ensureIndex(spark, Sf0001)
    // a handful of real (tiny) statistics jobs through the memo — the
    // BOUND itself is proven by the unit tests above against the same
    // DriverMemo class; this pins that termDfs actually rides it
    val vocab = Seq("hash", "join", "merge", "sort", "scan", "index",
      "table", "query")
    val pairs = for (a <- vocab; b <- vocab if a < b) yield Seq(a, b)
    pairs.foreach(ts => Fts.termDfs(spark, idx, ts, "en"))
    assert(Fts.dfProbeMemoSize <= 256,
      s"df memo must stay bounded, got ${Fts.dfProbeMemoSize}")
    // repeats of recent queries hit the memo — size must not grow
    val before = Fts.dfProbeMemoSize
    pairs.take(5).foreach(ts => Fts.termDfs(spark, idx, ts, "en"))
    assert(Fts.dfProbeMemoSize == before)
  }
}
