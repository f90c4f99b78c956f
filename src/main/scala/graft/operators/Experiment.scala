package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Experiment (A/B) analysis over the event stream — the readout every
  * product analytics stack runs on top of exactly the funnel/session
  * machinery this engine already has: split users into variants,
  * compare per-event-type conversion rates, and score the difference
  * with the two-proportion pooled z-test
  * (z = (pA − pB) / sqrt(p̂(1−p̂)(1/nA + 1/nB)), |z| > 1.96 ≙ p<.05).
  *
  * Variant assignment is the deterministic user_id parity split (the
  * same device [[Drift.psi]] uses for corpus halves); conversion for a
  * type = "user emitted ≥ minEvents events of that type" (an
  * engagement-threshold metric — the ≥1 flavor is degenerate on the
  * fixture, where every user emits every type and the pooled variance
  * collapses to zero). Everything reduces to
  * integer counts — distinct converting users per (type, variant) and
  * the global per-variant user counts riding as a 1-row broadcast —
  * so both engines compute the identical rationals before one rounded
  * double z per row.
  *
  * Scale shape: one scan → (type, variant, user) distinct →
  * map-side-combinable counts; the user totals are a second tiny
  * aggregate. No window, no join keyed by user.
  */
object Experiment {

  def abTest(spark: SparkSession, dir: String,
      minEvents: Long): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        (col("user_id") % 2 === 0).as("is_a"))
    val conv = ev.groupBy("event_type", "user_id", "is_a")
      .agg(count(lit(1)).as("n_ev"))
      .filter(col("n_ev") >= minEvents)
      .groupBy("event_type")
      .agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("xa"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("xb"))
    val users = ev.select("user_id", "is_a").distinct()
      .agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("nb"))
    val pa = col("xa").cast("double") / col("na")
    val pb = col("xb").cast("double") / col("nb")
    val pool = (col("xa") + col("xb")).cast("double") /
      (col("na") + col("nb"))
    conv.crossJoin(broadcast(users))
      .select(col("event_type"), col("xa"), col("na"), col("xb"),
        col("nb"),
        round(pa - pb, 6).as("lift"),
        // degenerate pooled rate (0% or 100% conversion) has zero
        // variance — z is undefined, reported as NULL (and ANSI mode
        // would otherwise throw on the division)
        when(col("xa") + col("xb") === 0 ||
            col("xa") + col("xb") === col("na") + col("nb"), lit(null))
          .otherwise(round((pa - pb) /
            sqrt(pool * (lit(1.0) - pool) *
              (lit(1.0) / col("na") + lit(1.0) / col("nb"))), 6))
          .as("z"))
      .orderBy(col("event_type").asc)
  }

  def abTestOracleSql(minEvents: Long): String =
    s"""WITH ev AS (
       |  SELECT event_type, user_id, user_id % 2 = 0 AS is_a
       |  FROM events
       |), conv AS (
       |  SELECT event_type,
       |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS xa,
       |    CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS xb
       |  FROM (SELECT event_type, user_id, is_a FROM ev
       |        GROUP BY event_type, user_id, is_a
       |        HAVING count(*) >= $minEvents) c
       |  GROUP BY event_type
       |), users AS (
       |  SELECT
       |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |    CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS nb
       |  FROM (SELECT DISTINCT user_id, is_a FROM ev) u
       |)
       |SELECT event_type, xa, na, xb, nb,
       |  round(CAST(xa AS DOUBLE)/na - CAST(xb AS DOUBLE)/nb, 6) AS lift,
       |  CASE WHEN xa + xb = 0 OR xa + xb = na + nb THEN NULL
       |    ELSE round((CAST(xa AS DOUBLE)/na - CAST(xb AS DOUBLE)/nb)
       |      / sqrt((CAST(xa + xb AS DOUBLE)/(na + nb))
       |           * (1.0 - CAST(xa + xb AS DOUBLE)/(na + nb))
       |           * (1.0/na + 1.0/nb)), 6) END AS z
       |FROM conv, users ORDER BY event_type ASC""".stripMargin
}
