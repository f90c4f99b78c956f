package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan

import graft.operators.{Collections, Fts, Relational}

/** The SURVEY §4.3 physical contract: collection-scoped reads go
  * through the partition-by-collection documents layout and the scope
  * filter lands in the scan's PARTITION filters (directory pruning) —
  * not merely the row-group PushedFilters a flat file gives. */
class PartitionPruneSpec extends SparkSpec {

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
    def all(x: SparkPlan): Seq[SparkPlan] =
      (x +: x.children.flatMap(all)) ++ x.subqueries.flatMap(all)
    all(p).collect { case s: FileSourceScanExec => s }
  }

  private def assertLangPruned(plan: SparkPlan, what: String): Unit = {
    val partScans = scans(plan).filter(_.partitionFilters.exists(
      _.references.exists(_.name == "lang")))
    assert(partScans.nonEmpty,
      s"$what: no scan carries a lang PartitionFilter:\n$plan")
    // and the pruning is real: the scan selects a strict subset of the
    // table's partitions
    partScans.foreach { s =>
      assert(s.relation.partitionSchema.fieldNames.contains("lang"),
        s"$what: scanned relation is not partitioned by lang")
    }
  }

  test("scopedDocuments plans a lang PartitionFilter over the " +
      "partitioned layout") {
    val df = Collections.scopedDocuments(spark, Sf0001, "en")
    assertLangPruned(df.queryExecution.executedPlan, "scopedDocuments")
    // directory pruning selects fewer files than the whole table holds
    val scoped = scans(df.queryExecution.executedPlan).head
    val all = scans(spark.table(
        Collections.ensurePartitionedDocuments(spark, Sf0001))
      .queryExecution.executedPlan).head
    assert(scoped.selectedPartitions.partitionCount <
        all.selectedPartitions.partitionCount,
      "scoped scan did not prune partitions")
  }

  test("fts_topk (search) reads the pruned layout") {
    val df = Fts.search(spark, Sf0001, "hash join merge", "en", 10)
    assertLangPruned(df.queryExecution.executedPlan, "search")
  }

  test("s3_pagination_scoped reads the pruned layout and matches the " +
      "flat-scan rows") {
    val df = Relational.paginateCollection(spark, Sf0001, "en", 10, 5)
    assertLangPruned(df.queryExecution.executedPlan, "paginateCollection")
    val viaFlat = Tables.documents(spark, Sf0001)
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id").offset(5).limit(10)
      .collect().map(_.toString).toSeq
    assert(df.collect().map(_.toString).toSeq == viaFlat)
  }

  test("in-place fixture regeneration serves FRESH rows through the " +
      "partitioned layout (content-fingerprint memo key)") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_regen_")
    def writeDocs(texts: Seq[(Long, String)]): Unit = {
      val tmp = d.resolve("documents_stage")
      texts.toDF("doc_id", "text")
        .selectExpr("doc_id", "text", "'en' AS lang",
          "'unit' AS source", "CAST(length(text) AS BIGINT) AS n_chars")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      // single-file layout like the driver fixture: move the part file
      // to <dir>/documents.parquet (a FILE), replacing the old one
      val part = {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.list(tmp)
        try s.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        finally s.close()
      }
      val dst = d.resolve("documents.parquet")
      java.nio.file.Files.move(part, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // force a distinct mtime even on coarse filesystem clocks
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() + scala.util.Random.nextInt(5000)))
      graft.sources.ParquetStore.deleteRecursively(tmp)
      Tables.invalidateDir(d.toString)
    }
    writeDocs(Seq((1L, "first corpus")))
    val t1 = Collections.ensurePartitionedDocuments(spark, d.toString)
    assert(spark.table(t1).select("text").as[String].collect().toSeq ==
      Seq("first corpus"))
    // regenerate IN PLACE (the ScaleUp overwrite scenario), then read
    // through the same entry point: the fingerprint key must force a
    // rebuild — a dir-keyed memo would keep serving "first corpus"
    writeDocs(Seq((1L, "second corpus"), (2L, "regenerated")))
    val t2 = Collections.ensurePartitionedDocuments(spark, d.toString)
    assert(t2 != t1, "regeneration must produce a new memo key")
    assert(spark.table(t2).select("text").as[String].collect().sorted
      .toSeq == Seq("regenerated", "second corpus"))
    graft.sources.ParquetStore.deleteRecursively(d)
  }
}
