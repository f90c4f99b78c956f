package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}

/** Cache-lifecycle registry for operator-internal persists.
  *
  * Several operators persist a bounded intermediate (minhash signature
  * frames, band tables, simhash fingerprints) that two downstream plan
  * branches share. The operators return LAZY frames, so they cannot
  * unpersist before the caller's action — instead every such persist
  * is registered here, and the caller releases the whole scope after
  * consuming the result:
  *
  * {{{
  *   val out = Dedup.minhashPairs(spark, dir, 0.8).collect()
  *   CacheScope.release(spark)   // unpersists operator intermediates
  * }}}
  *
  * Verify and Bench release after every query, so repeated operator
  * invocations (e.g. weightedSample called per mixture) never
  * accumulate dead cached copies. Thread-safe; release is idempotent
  * and scoped to one session so concurrent sessions don't clobber each
  * other's caches. */
object CacheScope {
  private val registry =
    mutable.Map.empty[SparkSession, mutable.Buffer[Dataset[_]]]

  /** Persist `ds` (default storage level) and register it for the
    * session-wide release. Returns `ds` for chaining. */
  def cached[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist()
    registry.synchronized {
      registry.getOrElseUpdate(ds.sparkSession, mutable.Buffer.empty) += ds
    }
    ds
  }

  /** Unpersist every frame registered for `spark` since the last
    * release. Non-blocking; safe to call with nothing registered. */
  def release(spark: SparkSession): Unit = {
    val frames = registry.synchronized {
      registry.remove(spark).getOrElse(mutable.Buffer.empty)
    }
    frames.foreach(_.unpersist(false))
  }
}
