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
