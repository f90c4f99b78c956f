package graft

import org.apache.spark.sql.functions._

/** Round-9 operator specs. */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  test("cdc_timestamps reproduces the reference trigger's stamp " +
      "semantics (created_at fixed, updated_at bumped on update)") {
    val rows = operators.Cdc.mergeTimestamps(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, (version, created, updated)) =>
      assert(updated >= created, s"doc $id updated_at < created_at")
      if (id >= 1000000L) {
        // fresh insert: both stamps are the batch time
        assert(created == operators.Cdc.BatchTs && updated == created)
      } else if (id % 10 == 0) {
        // updated in the batch: created_at untouched, updated_at bumped
        assert(version == 2L && created == operators.Cdc.BaseTs &&
          updated == operators.Cdc.BatchTs)
      } else {
        // untouched: updated_at still equals created_at (base load)
        assert(version == 1L && created == operators.Cdc.BaseTs &&
          updated == operators.Cdc.BaseTs)
      }
    }
    // deletes still apply last: no deleted id survives
    assert(!rows.keys.exists(id => id < 1000000L && id % 17 == 0))
    // and the stamp pass didn't change the survivor set vs merge_upsert
    val upsertIds = operators.Cdc.mergeUpsert(spark, Sf0001)
      .select($"doc_id").as[Long].collect().toSet
    assert(rows.keySet == upsertIds)
  }

  test("dedup_span_coverage matches a from-scratch interval-union " +
      "reference on the fixture corpus") {
    val n = operators.Dedup.SpanGramSize
    val out = operators.Dedup.spanCoverage(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // plain-Scala reference: tokenize, 5-gram per position, grams in >1
    // doc, per-doc union of [p, p+n) windows, per-source roll-up
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        graft.functions.TextAnalyzer.analyze(r.getString(2)).toVector))
    val gramDocs = scala.collection.mutable
      .Map.empty[String, scala.collection.mutable.Set[Long]]
    docs.foreach { case (id, _, toks) =>
      toks.sliding(n).filter(_.length == n).foreach { g =>
        gramDocs.getOrElseUpdate(g.mkString(" "),
          scala.collection.mutable.Set.empty) += id
      }
    }
    val dupGrams = gramDocs.collect {
      case (g, ids) if ids.size > 1 => g
    }.toSet
    val perSource = docs.groupBy(_._2).map { case (src, ds) =>
      val stats = ds.map { case (_, _, toks) =>
        val ps = toks.sliding(n).zipWithIndex.collect {
          case (g, p) if g.length == n && dupGrams(g.mkString(" ")) => p
        }.toSeq
        var covered = 0L
        var end = 0L
        ps.foreach { p =>
          covered += (p + n) - math.max(p.toLong, end)
          end = math.max(end, p.toLong + n)
        }
        (toks.length.toLong, covered)
      }
      val total = stats.map(_._1).sum
      val cov = stats.map(_._2).sum
      src -> (ds.length.toLong,
        stats.count(_._2 > 0).toLong,
        stats.count(s => s._2 * 2 >= s._1 && s._1 > 0).toLong,
        total, cov, cov * 1000000L / total)
    }
    assert(out == perSource)
    // fixture premise: planted duplicates make coverage non-trivial
    assert(out.values.exists(_._5 > 0), "no duplicated spans found")
  }
}
