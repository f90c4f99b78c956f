package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding-client analog — the reference's remote→local-fallback
  * batching contract (/root/reference/src/core/embedding_client.py:59-124):
  * embed texts in batches against a remote API; a remote that is not
  * configured/ready sends the request straight to the local model, and
  * ANY remote failure falls the WHOLE batch back to the local model
  * (batch-grain fallback, not per-document).
  *
  * No remote service can exist in this offline engine, so the remote is
  * STUBBED deterministically (the multimodal-decode precedent): both
  * "models" are seeded md5 feature projections — distinguishable by
  * seed, so tests can PROVE which path embedded each row — and the stub
  * remote deterministically rejects any batch containing a doc_id
  * divisible by [[RemoteFailMod]], exercising the try/catch fallback
  * exactly where the reference has it. The Spark plumbing is the real
  * part: batched mapPartitions (one "request" per `batchSize` rows —
  * the justified-mapPartitions class, like the binary codecs), typed
  * output, deterministic vectors.
  *
  * Batch membership depends on partitioning, so the REGISTERED demo
  * query pins repartition(1) + doc_id order for a deterministic split
  * (rows-only gate; the spec carries the semantics). Production runs
  * partition-parallel — fallback grain is per batch wherever the rows
  * land, which is the reference's behavior too (its batch is whatever
  * the caller sent).
  */
object EmbeddingClient {

  val Dim = 16
  // sparse enough that dense doc_id fixtures produce BOTH clean and
  // poisoned batches at every SF (mod 13 poisoned every 32-batch)
  val RemoteFailMod = 97L
  // transient-timeout class (disjoint prime): these docs time out on
  // the FIRST attempt only — the retryable failure, vs RemoteFailMod's
  // hard error. Mirrors the reference client's timeout-vs-error split
  // (/root/reference/src/core/embedding_client.py:59-124).
  val RemoteTimeoutMod = 89L
  val MaxRetries = 3

  /** Deterministic signed-int32 feature: big-endian first 4 bytes of
    * md5("seed:dim:text") — the integer the float embedding divides
    * from, and the exact value a cross-engine checksum would sum. */
  def rawFeature(seed: String, dim: Int, text: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$seed:$dim:$text".getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(h, 0, 4).getInt
  }

  def hashEmbed(seed: String, text: String): Array[Float] =
    (0 until Dim).map(i =>
      rawFeature(seed, i, text) / Int.MaxValue.toFloat).toArray

  case class Embedded(doc_id: Long, origin: String,
      embedding: Array[Float])

  /** Embed the corpus through the client: per batch, try the (stub)
    * remote; any rejection falls the whole batch back to local. */
  def embedCorpus(spark: SparkSession, dir: String, batchSize: Int = 32,
      remoteReady: Boolean = true): Dataset[Embedded] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val viaRemote =
            try {
              if (!remoteReady)
                throw new IllegalStateException("remote not configured")
              Some(batch.map { case (id, text) =>
                if (id % RemoteFailMod == 0)
                  throw new RuntimeException(
                    s"stub remote rejected doc $id")
                Embedded(id, "remote", hashEmbed("remote-v1", text))
              })
            } catch { case _: Exception => None }
          viaRemote.getOrElse(batch.map { case (id, text) =>
            Embedded(id, "local", hashEmbed("local-v1", text))
          })
        }
      }
  }

  /** Readiness gate — the reference DB's connect-retry loop
    * (/root/reference/src/db/connection.py:40-59: up to 30 attempts,
    * 5 s apart) with the probe injected and the waits RECORDED instead
    * of slept (deterministic; a deployment passes a real prober and
    * sleeps the schedule). Returns (ready, attemptsUsed, backoffMs). */
  def awaitReady(probe: Int => Boolean, maxAttempts: Int = 30,
      delayMs: Long = 5000L): (Boolean, Int, Seq[Long]) = {
    val waits = Seq.newBuilder[Long]
    var attempt = 1
    while (attempt <= maxAttempts) {
      if (probe(attempt)) return (true, attempt, waits.result())
      if (attempt < maxAttempts) waits += delayMs
      attempt += 1
    }
    (false, maxAttempts, waits.result())
  }

  case class EmbeddedR(doc_id: Long, origin: String, attempts: Int,
      embedding: Array[Float])

  /** The retry envelope around the batch fallback: per batch, up to
    * MaxRetries attempts against the stub remote. A TIMEOUT (transient:
    * RemoteTimeoutMod docs fail attempt 1 only) is retried; a hard
    * ERROR (RemoteFailMod docs, any attempt) falls the whole batch back
    * to local immediately — the reference client's timeout-vs-error
    * distinction, with the attempt count carried on every row. */
  def embedCorpusRetrying(spark: SparkSession, dir: String,
      batchSize: Int = 32): Dataset[EmbeddedR] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .repartition(1).sortWithinPartitions(col("doc_id"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          var attempt = 1
          var out: Option[Seq[EmbeddedR]] = None
          var fellBack = false
          while (out.isEmpty && !fellBack) {
            try {
              if (batch.exists(_._1 % RemoteFailMod == 0))
                throw new IllegalStateException("hard error")
              if (attempt == 1 &&
                  batch.exists(_._1 % RemoteTimeoutMod == 0))
                throw new java.util.concurrent.TimeoutException("slow")
              out = Some(batch.map { case (id, text) =>
                EmbeddedR(id, "remote", attempt,
                  hashEmbed("remote-v1", text))
              })
            } catch {
              case _: java.util.concurrent.TimeoutException
                  if attempt < MaxRetries =>
                attempt += 1 // retryable: timeout → try again
              case _: Exception =>
                fellBack = true // hard error (or retries exhausted)
            }
          }
          out.getOrElse(batch.map { case (id, text) =>
            EmbeddedR(id, "local", attempt, hashEmbed("local-v1", text))
          })
        }
      }
  }

  /** Registered retry-envelope summary — (origin, attempts, n_docs)
    * over the deterministic doc_id-ordered batching. Fully
    * oracle-expressible: batch membership is ordered position div
    * batchSize, and the origin/attempts outcome is a pure function of
    * which fail-mod classes the batch contains. */
  def retrySummary(spark: SparkSession, dir: String,
      batchSize: Int = 32): DataFrame =
    embedCorpusRetrying(spark, dir, batchSize).toDF()
      .groupBy("origin", "attempts")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("origin").asc, col("attempts").asc)

  def retrySummaryOracleSql(batchSize: Int = 32): String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    (row_number() OVER (ORDER BY doc_id ASC) - 1) // $batchSize
       |      AS b
       |  FROM documents
       |), bat AS (
       |  SELECT b,
       |    max(CASE WHEN doc_id % $RemoteFailMod = 0 THEN 1 ELSE 0 END)
       |      AS err,
       |    max(CASE WHEN doc_id % $RemoteTimeoutMod = 0 THEN 1 ELSE 0
       |      END) AS tmo,
       |    count(*) AS n
       |  FROM d GROUP BY b
       |)
       |SELECT CASE WHEN err = 1 THEN 'local' ELSE 'remote' END
       |    AS origin,
       |  CAST(CASE WHEN err = 1 THEN 1 WHEN tmo = 1 THEN 2 ELSE 1 END
       |    AS INT) AS attempts,
       |  CAST(sum(n) AS BIGINT) AS n_docs
       |FROM bat GROUP BY 1, 2 ORDER BY origin ASC, attempts ASC""".stripMargin

  /** Registered demo: deterministic single-partition doc_id-ordered
    * split, summarized per origin (rows-only gate; semantics are
    * spec-gated in Round9OpsSpec). */
  def embedSummary(spark: SparkSession, dir: String,
      batchSize: Int = 32): DataFrame = {
    import spark.implicits._
    val src = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .repartition(1).sortWithinPartitions(col("doc_id"))
      .as[(Long, String)]
    val embedded = src.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val viaRemote =
          try {
            Some(batch.map { case (id, text) =>
              if (id % RemoteFailMod == 0)
                throw new RuntimeException(s"rejected $id")
              Embedded(id, "remote", hashEmbed("remote-v1", text))
            })
          } catch { case _: Exception => None }
        viaRemote.getOrElse(batch.map { case (id, text) =>
          Embedded(id, "local", hashEmbed("local-v1", text))
        })
      }
    }
    embedded.toDF()
      .groupBy("origin")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("origin").asc)
  }
}
