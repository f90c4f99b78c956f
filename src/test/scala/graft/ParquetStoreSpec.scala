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

  test("s4 scratch GC: a new corpus generation leaves exactly one live root") {
    // r16 verdict #6: fixture regenerations must not accumulate dead
    // graft_s4_* stores — creating a generation vacuums every other
    // fingerprint's root
    val tmpRoot = Paths.get(sys.props("java.io.tmpdir"))
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
    // clear all s4 roots so the next call takes the CREATE path, then
    // plant a stale generation that the create must reap
    s4Roots().foreach(n => ParquetStore.deleteRecursively(tmpRoot.resolve(n)))
    val stale = tmpRoot.resolve("graft_s4_stalegen")
    Files.createDirectories(stale.resolve("col_a"))
    val digest = graft.operators.Collections.appendStateDigest(spark, Sf0001)
    assert(digest.count() > 0)
    val roots = s4Roots()
    assert(!roots.contains("graft_s4_stalegen"), s"stale root survived: $roots")
    assert(roots.size == 1, s"expected exactly one live root, got $roots")
    // idempotent re-run on the SAME generation: no re-seed, same state
    assert(graft.operators.Collections.appendStateDigest(spark, Sf0001)
      .count() == digest.count())
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
