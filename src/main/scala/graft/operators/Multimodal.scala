package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column handling (build-brief requirement): image/audio/video
  * as opaque `binary` columns with typed metadata, processed in batched
  * partition passes.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives a deterministic fake "decoded frame"
  * from the bytes themselves, so the Spark-side plumbing — schema, batch
  * shape, partition-parallel iteration, feature extraction, resize,
  * frame-sampling — is real and testable end-to-end. Swapping the stub
  * for a real codec changes ONE function.
  *
  * Shapes mirror a production pipeline:
  *   - assets table: (asset_id, media BINARY, media_type, n_bytes)
  *   - mapPartitions with an internal batch buffer (the Scala analog of
  *     mapInPandas's Arrow batches: amortizes per-batch codec setup)
  *   - features: fixed-length Array[Float] per asset (byte histogram)
  *
  * At 100 TB the binary column dominates IO: the features projection
  * never carries `media` past the decode stage (column pruning drops it),
  * and decode parallelism = partition count.
  */
object Multimodal {

  val BatchSize = 64 // decode-batch shape (mapInPandas Arrow-batch analog)
  val HistogramBins = 16

  case class Asset(asset_id: Long, media: Array[Byte], media_type: String,
      n_bytes: Long)
  case class DecodedFrame(width: Int, height: Int, pixels: Array[Byte])
  case class AssetFeatures(asset_id: Long, media_type: String, width: Int,
      height: Int, n_bytes: Long, histogram: Array[Float])

  /** Build a deterministic binary assets table from the documents fixture
    * (text bytes stand in for media payloads; media_type cycles). */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes(StandardCharsets.UTF_8)
        val mt = Seq("image", "audio", "video")((id % 3).toInt)
        Asset(id, bytes, mt, bytes.length.toLong)
      }
  }

  /** STUB decode: a real implementation would call an image/audio codec
    * here. The fake derives WxH from the payload length and "pixels" from
    * the bytes — deterministic, so downstream stages are fully testable. */
  def decodeStub(media: Array[Byte]): DecodedFrame = {
    val w = math.max(1, media.length % 64)
    val h = math.max(1, (media.length / 64) + 1)
    DecodedFrame(w, h, media)
  }

  /** Resize stub: crops/repeats pixel bytes to the target size (a real
    * impl would interpolate). Pure function of the decoded frame. */
  def resizeStub(f: DecodedFrame, w: Int, h: Int): DecodedFrame = {
    val need = w * h
    val px = Array.tabulate[Byte](need)(i => f.pixels(i % f.pixels.length))
    DecodedFrame(w, h, px)
  }

  /** Frame sampling stub for video: every nth "frame" (row of pixels). */
  def sampleFramesStub(f: DecodedFrame, everyNth: Int): Seq[DecodedFrame] =
    (0 until f.height by everyNth).map { r =>
      val from = math.min(r * f.width, f.pixels.length)
      val until = math.min((r + 1) * f.width, f.pixels.length)
      DecodedFrame(f.width, 1, f.pixels.slice(from, until))
    }

  /** Feature extraction over the assets table: batched mapPartitions,
    * decode → normalized byte histogram. The batch buffer mirrors the
    * mapInPandas batch shape (decode setup amortized per batch). */
  def extractFeatures(spark: SparkSession,
      assetsDs: Dataset[Asset]): Dataset[AssetFeatures] = {
    import spark.implicits._
    assetsDs.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // per-batch "codec setup" would happen here
        batch.map { a =>
          val frame = decodeStub(a.media)
          val hist = new Array[Float](HistogramBins)
          frame.pixels.foreach { b =>
            hist(((b & 0xff) * HistogramBins) / 256) += 1f
          }
          val n = math.max(1, frame.pixels.length)
          (0 until HistogramBins).foreach(i => hist(i) /= n)
          AssetFeatures(a.asset_id, a.media_type, frame.width,
            frame.height, a.n_bytes, hist)
        }
      }
    }
  }

  /** Registered query: per-type feature statistics (deterministic;
    * the histogram collapses to its max bin for a stable scalar). */
  def featureStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(spark, assets(spark, dir)).toDF()
      .select(col("asset_id"), col("media_type"), col("width"),
        col("height"), col("n_bytes"),
        array_max(col("histogram")).as("max_bin"))
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("width")), 4).as("avg_width"),
        round(avg(col("height")), 4).as("avg_height"),
        round(avg(col("max_bin")), 6).as("avg_max_bin"))
      .orderBy(col("media_type").asc)
  }

  /** Oracle for the SQL-expressible projection of the stub pipeline:
    * width/height derive from octet_length only. (The histogram needs
    * byte-level access — covered by MultimodalSpec instead.) */
  def dimensionsOracleSql: String =
    s"""SELECT
       |  CASE WHEN doc_id % 3 = 0 THEN 'image'
       |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
       |    AS media_type,
       |  count(*) AS n_assets,
       |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       |  round(avg(greatest(octet_length(encode(text)) % 64, 1)), 4)
       |    AS avg_width,
       |  round(avg((octet_length(encode(text)) // 64) + 1), 4)
       |    AS avg_height
       |FROM documents GROUP BY 1 ORDER BY media_type ASC""".stripMargin

  /** The SQL-expressible projection (no histogram) for the oracle gate. */
  def dimensions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(spark, assets(spark, dir)).toDF()
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("width")), 4).as("avg_width"),
        round(avg(col("height")), 4).as("avg_height"))
      .orderBy(col("media_type").asc)
  }
}
