package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Builds a session with spark.sql.extensions set and checks the custom
  * functions resolve through pure SQL — the way a user of the packaged
  * library gets them. The shared test session may already exist in this
  * JVM; clearing the default/active session makes getOrCreate construct
  * a NEW session (reusing the context) so the extensions actually apply.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions inject cover_density_score and chunk_document into SQL") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // NB: spark.sql.extensions is a STATIC conf read from the
      // SparkContext at session construction — when this JVM already has
      // a context (the shared test session), builder config is ignored.
      // withExtensions applies the same class regardless of context; the
      // config path works in any fresh JVM (e.g. spark-submit --conf).
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new graft.plans.GraftExtensions()(_))
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val cd = spark.sql(
        "SELECT cover_density_score(array(array(0), array(1))) AS s")
        .head().getDouble(0)
      assert(math.abs(cd - 0.5) < 1e-12) // one width-2 cover

      spark.sql("SELECT 'alpha beta gamma delta epsilon' AS text")
        .createOrReplaceTempView("ext_docs")
      val chunks = spark.sql(
        """SELECT c.chunk_index, c.content FROM ext_docs
          |LATERAL VIEW chunk_document(text, 12, 3) c""".stripMargin)
        .collect()
      assert(chunks.length > 1)
      assert(chunks.head.getAs[String]("content").nonEmpty)
    } finally {
      // restore the shared session; never stop the shared context
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
