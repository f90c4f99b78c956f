package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{ScaleOps, TextOps}

/** Pins the metadata-filter routing (r17 verdict #1): the switch
  * between the per-query JSON-parse scan and the persist-once typed
  * sidecar probe, and the bit-identity of the two routes on BOTH
  * filter shapes — including the reference's string-coercion contract
  * (`5` matches `"5"`, /root/reference/src/core/vector_store.py:290-292),
  * which must survive the from_json map extraction exactly.
  */
class MetaRouteSpec extends SparkSpec {

  private def all(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toSeq

  test("switch point: sub-threshold corpus scans; larger corpus probes") {
    spark.conf.unset("graft.meta.routeMinBytes")
    spark.conf.unset("graft.meta.route")
    try {
      val bytes = ScaleOps.tableBytes(Sf0001, "events")
      assert(bytes > 0)
      // below the default 1 MiB threshold → scan route
      assert(!TextOps.routeMetaToIndex(spark, Sf0001))
      // threshold at/below corpus size → sidecar route
      spark.conf.set("graft.meta.routeMinBytes", bytes.toString)
      assert(TextOps.routeMetaToIndex(spark, Sf0001))
      spark.conf.unset("graft.meta.routeMinBytes")
      // explicit pin overrides the size policy both ways; typos fail loudly
      spark.conf.set("graft.meta.route", "index")
      assert(TextOps.routeMetaToIndex(spark, Sf0001))
      spark.conf.set("graft.meta.route", "scan")
      assert(!TextOps.routeMetaToIndex(spark, Sf0001))
      spark.conf.set("graft.meta.route", "sidecar")
      intercept[IllegalArgumentException] {
        TextOps.routeMetaToIndex(spark, Sf0001)
      }
    } finally {
      spark.conf.unset("graft.meta.route")
      spark.conf.unset("graft.meta.routeMinBytes")
    }
  }

  test("equality filter: sidecar probe is bit-identical to the scan, " +
      "coercion included") {
    val scan = all(TextOps.metadataFilter(spark, Sf0001, "k", "42"))
    val probe = all(TextOps.metadataFilterIndexed(spark, Sf0001, "k", "42"))
    assert(probe == scan && scan.nonEmpty,
      s"probe(${probe.size}) must equal non-empty scan(${scan.size})")
    // a key that is absent from every row matches nothing on both routes
    assert(TextOps.metadataFilterIndexed(spark, Sf0001, "nope", "1")
      .isEmpty)
    assert(TextOps.metadataFilter(spark, Sf0001, "nope", "1").isEmpty)
  }

  test("range filter: sidecar probe is bit-identical to the scan") {
    val scan = all(TextOps.metadataRangeFilter(spark, Sf0001, "k", 25L, 75L))
    val probe = all(
      TextOps.metadataRangeFilterIndexed(spark, Sf0001, "k", 25L, 75L))
    assert(probe == scan && scan.nonEmpty)
  }

  test("auto entry points follow the pinned route") {
    spark.conf.set("graft.meta.route", "index")
    try {
      val viaIndex =
        all(TextOps.metadataRangeFilterAuto(spark, Sf0001, "k", 25L, 75L))
      spark.conf.set("graft.meta.route", "scan")
      val viaScan =
        all(TextOps.metadataRangeFilterAuto(spark, Sf0001, "k", 25L, 75L))
      assert(viaIndex == viaScan && viaScan.nonEmpty)
    } finally spark.conf.unset("graft.meta.route")
  }

  test("vacuumed sidecar drops exactly the tombstoned events") {
    val full = TextOps.metadataRangeFilterIndexed(
      spark, Sf0001, "k", 0L, 1000000L)
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    val vac = TextOps.metadataRangeFilterVacuumed(
      spark, Sf0001, "k", 0L, 1000000L, 7L)
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    assert(vac < full, "vacuum must remove the mod-7 tombstones")
  }
}
