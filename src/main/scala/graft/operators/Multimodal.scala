package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column handling (build-brief requirement): image/audio/video
  * as opaque `binary` columns with typed metadata, processed in batched
  * partition passes.
  *
  * The decode step is REAL for the two pure-JVM formats: a BMP parser
  * (magic, header geometry, declared pixel-array offset, bottom-up row
  * order, 4-byte row padding) and a WAV parser (RIFF chunk walk, PCM
  * format gate, data-chunk discovery). Assets are genuine BMP/WAV
  * payloads synthesized deterministically from the documents fixture, so
  * the full path — encode → binary column → partition-batched decode →
  * feature extraction — is hash-gated against an oracle that recomputes
  * the encoded geometry independently. A corrupt header yields None and
  * the row is dropped, like the reference's parse-failure path
  * (/root/reference/scripts/ingest_servicenow.py:85-87 pattern).
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
      height: Int, n_bytes: Long, n_pixels: Long, max_bin_count: Long,
      histogram: Array[Float])

  // ---- real codecs (pure JVM) ------------------------------------------

  /** Minimal 24-bit uncompressed BMP writer (54-byte header, bottom-up
    * rows, rows padded to 4 bytes — the format as actually specified). */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, "rgb must be w*h*3 bytes")
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val dataSize = rowBytes * h
    val bb = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + dataSize).putInt(0).putInt(54)      // size, reserved, offset
    bb.putInt(40).putInt(w).putInt(h)                  // BITMAPINFOHEADER
    bb.putShort(1).putShort(24)                        // planes, bpp
    bb.putInt(0).putInt(dataSize)                      // BI_RGB, image size
    bb.putInt(2835).putInt(2835).putInt(0).putInt(0)   // 72 dpi, palette
    val pad = new Array[Byte](rowBytes - w * 3)
    (h - 1 to 0 by -1).foreach { r =>                  // bottom-up
      bb.put(rgb, r * w * 3, w * 3).put(pad)
    }
    bb.array()
  }

  /** BMP decode: validates magic + geometry + declared offset, flips the
    * bottom-up padded rows to a top-down packed pixel array. Returns
    * None on anything malformed. */
  def decodeBmp(media: Array[Byte]): Option[DecodedFrame] = {
    if (media.length < 54 || media(0) != 'B' || media(1) != 'M') None
    else {
      val bb = ByteBuffer.wrap(media).order(ByteOrder.LITTLE_ENDIAN)
      val dataOffset = bb.getInt(10)
      val w = bb.getInt(18)
      val h = bb.getInt(22)
      val bpp = bb.getShort(28)
      // Long arithmetic + a geometry cap: a crafted header with
      // w ~ Int.MaxValue/3 would overflow w*3 to negative, slip past a
      // naive bounds check, and crash the task instead of returning
      // None (the documented malformed-input contract)
      val rowBytes = ((w.toLong * 3 + 3) / 4) * 4
      if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) ||
        bpp != 24 || dataOffset < 54 ||
        media.length.toLong < dataOffset.toLong + rowBytes * h) None
      else {
        val px = new Array[Byte](w * h * 3)
        (0 until h).foreach { r =>
          System.arraycopy(media,
            dataOffset + ((h - 1 - r) * rowBytes).toInt,
            px, r * w * 3, w * 3)
        }
        Some(DecodedFrame(w, h, px))
      }
    }
  }

  /** Canonical 44-byte-header mono 8-bit PCM WAV writer. */
  def encodeWav(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(44 + samples.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(36 + samples.length)
    bb.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    bb.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(16).putShort(1).putShort(1)              // PCM, mono
    bb.putInt(sampleRate).putInt(sampleRate)           // byte rate = rate·1·1
    bb.putShort(1).putShort(8)                         // block align, bits
    bb.put("data".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(samples.length)
    bb.put(samples)
    bb.array()
  }

  /** WAV decode: RIFF/WAVE gate, then a real chunk walk (fmt may be
    * followed by LIST/fact/etc. before data). Only mono 8-bit PCM is
    * accepted; the sample stream becomes a 1-row "frame" (width =
    * sample count) so every downstream stage is modality-agnostic. */
  def decodeWav(media: Array[Byte]): Option[DecodedFrame] = {
    def ascii(off: Int, n: Int) =
      new String(media, off, n, StandardCharsets.US_ASCII)
    if (media.length < 44 || ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE")
      None
    else {
      val bb = ByteBuffer.wrap(media).order(ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var fmtOk = false
      var data: Option[(Int, Int)] = None // (offset, length)
      while (pos + 8 <= media.length && data.isEmpty) {
        val id = ascii(pos, 4)
        val len = bb.getInt(pos + 4)
        if (len < 0 || pos + 8 + len > media.length) pos = media.length
        else {
          if (id == "fmt " && len >= 16)
            fmtOk = bb.getShort(pos + 8) == 1 &&      // PCM
              bb.getShort(pos + 10) == 1 &&           // mono
              bb.getShort(pos + 22) == 8              // 8-bit
          else if (id == "data") data = Some((pos + 8, len))
          pos += 8 + len + (len & 1)                  // chunks are word-aligned
        }
      }
      data.collect { case (off, len) if fmtOk =>
        DecodedFrame(len, 1, media.slice(off, off + len))
      }
    }
  }

  /** Modality dispatch: image/video payloads are BMP, audio is WAV. */
  def decode(media: Array[Byte], mediaType: String): Option[DecodedFrame] =
    if (mediaType == "audio") decodeWav(media) else decodeBmp(media)

  // ---- asset synthesis + transforms ------------------------------------

  /** Deterministic binary assets from the documents fixture: every doc
    * becomes a REAL media file — image/video ids get a BMP whose
    * geometry derives from the id and whose pixels are the doc's bytes
    * (repeated), audio ids get an 8-bit PCM WAV of the doc's bytes. */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes(StandardCharsets.UTF_8)
        val mt = Seq("image", "audio", "video")((id % 3).toInt)
        val media = mt match {
          case "audio" => encodeWav(8000, bytes)
          case _ =>
            val w = (id % 31).toInt + 2
            val h = (id % 17).toInt + 2
            val rgb = Array.tabulate[Byte](w * h * 3)(i =>
              bytes(i % bytes.length))
            encodeBmp(w, h, rgb)
        }
        Asset(id, media, mt, media.length.toLong)
      }
  }

  /** Resize: crops/repeats pixel bytes to the target size (nearest-
    * neighbor would index rows/cols; byte-cyclic keeps it deterministic
    * for the property tests). Pure function of the decoded frame. */
  def resizeStub(f: DecodedFrame, w: Int, h: Int): DecodedFrame = {
    val need = w * h
    val px = Array.tabulate[Byte](need)(i => f.pixels(i % f.pixels.length))
    DecodedFrame(w, h, px)
  }

  /** Frame sampling for video: every nth row of the decoded frame. */
  def sampleFramesStub(f: DecodedFrame, everyNth: Int): Seq[DecodedFrame] =
    (0 until f.height by everyNth).map { r =>
      val from = math.min(r * f.width, f.pixels.length)
      val until = math.min((r + 1) * f.width, f.pixels.length)
      DecodedFrame(f.width, 1, f.pixels.slice(from, until))
    }

  /** Feature extraction over the assets table: batched mapPartitions,
    * real decode → normalized byte histogram; undecodable payloads are
    * dropped (parse-failure semantics). The batch buffer mirrors the
    * mapInPandas batch shape (codec setup amortized per batch). */
  def extractFeatures(spark: SparkSession,
      assetsDs: Dataset[Asset]): Dataset[AssetFeatures] = {
    import spark.implicits._
    assetsDs.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // per-batch "codec setup" would happen here
        batch.flatMap { a =>
          decode(a.media, a.media_type).map { frame =>
            // integer bin counts first: the max count is exact (and
            // oracle-comparable); the float histogram is derived
            val counts = new Array[Long](HistogramBins)
            frame.pixels.foreach { b =>
              counts(((b & 0xff) * HistogramBins) / 256) += 1L
            }
            val n = math.max(1, frame.pixels.length)
            val hist = Array.tabulate(HistogramBins)(i =>
              counts(i).toFloat / n)
            AssetFeatures(a.asset_id, a.media_type, frame.width,
              frame.height, a.n_bytes, frame.pixels.length.toLong,
              counts.max, hist)
          }
        }
      }
    }
  }

  /** Registered query: per-type feature statistics. The histogram
    * collapses to its dominant-bin FREQUENCY (max integer bin count
    * over pixel count, divided in DOUBLE) — exact arithmetic both
    * engines can reproduce bit-for-bit, unlike a float32 histogram
    * lookup. */
  def featureStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(spark, assets(spark, dir)).toDF()
      .select(col("asset_id"), col("media_type"), col("width"),
        col("height"), col("n_bytes"),
        (col("max_bin_count").cast("double") /
          greatest(col("n_pixels"), lit(1L)).cast("double")).as("max_bin"))
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("width")), 4).as("avg_width"),
        round(avg(col("height")), 4).as("avg_height"),
        round(avg(col("max_bin")), 6).as("avg_max_bin"))
      .orderBy(col("media_type").asc)
  }

  /** Oracle for featureStats: the decoded pixel stream is the doc's
    * UTF-8 bytes — verbatim for WAV, cyclically repeated to w*h*3 for
    * BMP — so DuckDB recomputes each asset's per-bin byte counts from
    * the text alone: bin(c) = c // 16; full cycles contribute
    * reps × rawcount, the partial cycle adds counts over the first
    * `rem` bytes. The corpus is ASCII so chars == bytes. A decode bug
    * (row flip, padding, chunk walk) changes the pixel stream and
    * breaks the hash. */
  def featureStatsOracleSql: String =
    s"""WITH a AS (
       |  $synthCte
       |), counted AS (
       |  SELECT doc_id, media_type, text, tl, bw, bh,
       |    list_transform(range(0, $HistogramBins), b ->
       |      len(list_filter(range(1, tl + 1),
       |        i -> ascii(substr(text, i, 1)) // 16 = b))) AS raw,
       |    CASE WHEN media_type = 'audio' THEN tl
       |         ELSE bw * bh * 3 END AS npix
       |  FROM a
       |), per_asset AS (
       |  SELECT doc_id, media_type, bw, bh, tl, npix,
       |    $synthNBytes AS n_bytes,
       |    list_max(CASE WHEN media_type = 'audio' THEN raw
       |      ELSE list_transform(range(0, $HistogramBins), b ->
       |        (npix // tl) * raw[b + 1] +
       |        len(list_filter(range(1, (npix % tl) + 1),
       |          i -> ascii(substr(text, i, 1)) // 16 = b))) END)
       |      AS max_count
       |  FROM counted
       |)
       |SELECT media_type, count(*) AS n_assets,
       |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       |  round(avg(CASE WHEN media_type = 'audio' THEN npix ELSE bw END),
       |    4) AS avg_width,
       |  round(avg(CASE WHEN media_type = 'audio' THEN 1 ELSE bh END), 4)
       |    AS avg_height,
       |  round(avg(CAST(max_count AS DOUBLE)
       |        / CAST(greatest(npix, 1) AS DOUBLE)), 6) AS avg_max_bin
       |FROM per_asset GROUP BY media_type ORDER BY media_type ASC""".stripMargin

  /** ONE SQL rendering of the asset-synthesis parameters (type cycle,
    * BMP geometry, byte lengths) — both multimodal oracles build on
    * this so the constants cannot drift from `assets()` in one place
    * but not the other. */
  private val synthCte: String =
    """SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
      |      AS media_type,
      |    text,
      |    octet_length(encode(text)) AS tl,
      |    (doc_id % 31) + 2 AS bw,
      |    (doc_id % 17) + 2 AS bh
      |  FROM documents""".stripMargin

  /** File size: 44-byte WAV header + one byte per sample, or 54-byte
    * BMP header + 4-byte-padded rows. */
  private val synthNBytes: String =
    """CASE WHEN media_type = 'audio' THEN 44 + tl
      |         ELSE 54 + ((bw * 3 + 3) // 4) * 4 * bh END""".stripMargin

  /** Oracle for the decoded geometry: the BMP/WAV headers round-trip the
    * encoder's deterministic parameters, so DuckDB recomputes width,
    * height and file size from doc_id and the text byte length alone. A
    * decode bug — wrong offset, padding, row order, chunk walk — breaks
    * the hash. */
  def dimensionsOracleSql: String =
    s"""WITH a AS (
       |  $synthCte
       |), d AS (
       |  SELECT media_type,
       |    CASE WHEN media_type = 'audio' THEN tl ELSE bw END AS width,
       |    CASE WHEN media_type = 'audio' THEN 1 ELSE bh END AS height,
       |    $synthNBytes AS n_bytes
       |  FROM a
       |)
       |SELECT media_type, count(*) AS n_assets,
       |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       |  round(avg(width), 4) AS avg_width,
       |  round(avg(height), 4) AS avg_height
       |FROM d GROUP BY 1 ORDER BY media_type ASC""".stripMargin

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
