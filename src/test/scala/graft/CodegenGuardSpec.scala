package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Whole-stage-codegen regression guard. A failed janino compile is
  * NOT an error to Spark — it logs one ERROR line and silently falls
  * back to interpreted evaluation, so correctness stays green while a
  * hot path quietly runs 4-10× slower. Round 11 caught two such
  * silent fallbacks only via the scale ladder's slope (the unrolled
  * BQ kernels blowing the 64 KB method limit; WinnowFps' generated
  * call failing to resolve because the kernel's name collided with
  * Expression.eval and lost its static forwarder). This spec pins the
  * property directly: running the native-kernel queries must produce
  * ZERO CodeGenerator error events. */
class CodegenGuardSpec extends SparkSpec {

  test("native-kernel queries produce no codegen-fallback errors") {
    val logger = LogManager
      .getLogger(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    val errors = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val guard = new AbstractAppender("codegen-guard", null, null, true,
        Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit =
        if (e.getLevel.isMoreSpecificThan(Level.ERROR))
          errors.add(e.getMessage.getFormattedMessage.linesIterator
            .next().take(160))
    }
    guard.start()
    logger.addAppender(guard)
    try {
      // one query per native kernel family (bq_pack/bq_asym, vec_dot,
      // ivec_dot, pq_encode, winnow_fps, light_stem, cover_density,
      // quantize_i8 via knn_quantized/quant_stats)
      val names = Seq("bq_ann", "bq_recall", "fingerprint_winnow",
        "knn_cosine", "knn_quantized", "quant_stats", "pq_scan",
        "ivfpq_ann", "fts_topk_cd", "fts_topk_stemmed")
      names.foreach { n =>
        SparkEntry.queries(n)(spark, Sf0001).count()
        graft.operators.CacheScope.release(spark)
      }
      assert(errors.isEmpty,
        s"codegen fallback detected:\n${String.join("\n", errors)}")
    } finally {
      logger.removeAppender(guard)
      guard.stop()
    }
  }
}
