package graft

import java.nio.file.{Files, Paths}

import graft.sources.ParquetStore

class ParquetStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("pstore").toString
    s"$d/table"
  }

  test("deleteWhere: anti-join rewrite removes matching rows, reports count") {
    val dir = freshDir()
    (1L to 10L).map(i => (i, s"doc$i")).toDF("id", "content")
      .write.parquet(dir)
    val removed = ParquetStore.deleteWhere(spark, dir,
      Seq(2L, 4L, 99L).toDF("id"), Seq("id"))
    assert(removed == 2) // 99 matches nothing
    val left = spark.read.parquet(dir).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(left.toSeq == Seq(1L, 3L, 5L, 6L, 7L, 8L, 9L, 10L))
  }

  test("appendIfAbsent: inserts only new keys (auto-create semantics)") {
    val dir = freshDir()
    assert(ParquetStore.appendIfAbsent(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "content"), Seq("id")) == 2)
    // second call: one duplicate key, one new
    assert(ParquetStore.appendIfAbsent(spark, dir,
      Seq((2L, "B2"), (3L, "c")).toDF("id", "content"), Seq("id")) == 1)
    val rows = spark.read.parquet(dir).as[(Long, String)]
      .collect().toMap
    assert(rows == Map(1L -> "a", 2L -> "b", 3L -> "c")) // original 2 kept
  }

  test("overwriteAtomic: no tmp/old residue after the swap") {
    val dir = freshDir()
    Seq((1L, "x")).toDF("id", "content").write.parquet(dir)
    ParquetStore.overwriteAtomic(
      Seq((2L, "y")).toDF("id", "content"), dir)
    val parent = Paths.get(dir).getParent
    val residue = Files.list(parent).iterator()
    var names = List.empty[String]
    while (residue.hasNext) names ::= residue.next().getFileName.toString
    assert(names == List("table"))
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("s4 scratch GC: a new corpus generation leaves exactly one live " +
      "root per fixture; foreign and unattributed roots survive") {
    // r16 verdict #6: fixture regenerations must not accumulate dead
    // graft_s4_* stores. r17 ADVICE: the reap is SCOPED — only dead
    // generations carrying the SAME fixture-dir marker are touched,
    // and the whole test runs inside an isolated scratch root instead
    // of mutating the machine-wide tmpdir (no cross-session races).
    val tmpRoot = Files.createTempDirectory("s4gc")
    def s4Roots(): List[String] = {
      val s = Files.list(tmpRoot)
      try {
        val it = s.iterator()
        var out = List.empty[String]
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (n.startsWith("graft_s4_")) out ::= n
        }
        out
      } finally s.close()
    }
    // plant: a stale generation OF THIS FIXTURE (marker matches → must
    // be reaped), a live root of a DIFFERENT fixture (must survive),
    // and a markerless root we cannot attribute (must survive)
    val stale = tmpRoot.resolve("graft_s4_stalegen")
    Files.createDirectories(stale.resolve("col_a"))
    Files.write(stale.resolve("SOURCE_DIR"),
      Sf0001.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val foreign = tmpRoot.resolve("graft_s4_foreign")
    Files.createDirectories(foreign.resolve("col_a"))
    Files.write(foreign.resolve("SOURCE_DIR"),
      "/some/other/fixture".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val unmarked = tmpRoot.resolve("graft_s4_unmarked")
    Files.createDirectories(unmarked.resolve("col_a"))
    spark.conf.set("graft.s4.scratchRoot", tmpRoot.toString)
    try {
      val digest =
        graft.operators.Collections.appendStateDigest(spark, Sf0001)
      assert(digest.count() > 0)
      val roots = s4Roots()
      assert(!roots.contains("graft_s4_stalegen"),
        s"stale same-fixture root survived: $roots")
      assert(roots.contains("graft_s4_foreign"),
        s"foreign fixture's live root was reaped: $roots")
      assert(roots.contains("graft_s4_unmarked"),
        s"unattributed root was reaped: $roots")
      assert(roots.size == 3, s"expected live+foreign+unmarked, got $roots")
      // idempotent re-run on the SAME generation: no re-seed, same state
      assert(graft.operators.Collections.appendStateDigest(spark, Sf0001)
        .count() == digest.count())
    } finally {
      spark.conf.unset("graft.s4.scratchRoot")
      ParquetStore.deleteRecursively(tmpRoot)
    }
  }

  test("cascade delete: coordinated rewrite of collections + documents") {
    val colls = freshDir()
    val docs = freshDir()
    Seq((1L, "en"), (2L, "fr")).toDF("collection_id", "name")
      .write.parquet(colls)
    Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("doc_id", "collection_id")
      .write.parquet(docs)
    // delete collection 1 -> its documents cascade (S6)
    val victims = Seq(1L).toDF("collection_id")
    assert(ParquetStore.deleteWhere(spark, colls, victims,
      Seq("collection_id")) == 1)
    assert(ParquetStore.deleteWhere(spark, docs, victims,
      Seq("collection_id")) == 2)
    assert(spark.read.parquet(docs).count() == 1)
  }
}
