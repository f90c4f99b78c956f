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
}
