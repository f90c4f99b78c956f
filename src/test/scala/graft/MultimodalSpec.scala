package graft

import java.nio.charset.StandardCharsets

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("BMP round-trip: geometry, row order and padding survive the wire") {
    // w=5 → 15 row bytes → 1 pad byte per row: exercises padding + flip
    val rgb = Array.tabulate[Byte](5 * 3 * 3)(_.toByte)
    val bmp = Multimodal.encodeBmp(5, 3, rgb)
    val f = Multimodal.decodeBmp(bmp).get
    assert(f.width == 5 && f.height == 3)
    assert(f.pixels.toSeq == rgb.toSeq) // bottom-up flip restores order
  }

  test("BMP decode rejects corrupt inputs") {
    val good = Multimodal.encodeBmp(4, 2, new Array[Byte](24))
    assert(Multimodal.decodeBmp(Array[Byte](1, 2, 3)).isEmpty)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(Multimodal.decodeBmp(badMagic).isEmpty)
    val truncated = good.slice(0, good.length - 4)
    assert(Multimodal.decodeBmp(truncated).isEmpty)
  }

  test("WAV round-trip and chunk walk past an inserted LIST chunk") {
    val samples = "pcm sample payload".getBytes(StandardCharsets.UTF_8)
    val wav = Multimodal.encodeWav(8000, samples)
    val f = Multimodal.decodeWav(wav).get
    assert(f.width == samples.length && f.height == 1)
    assert(f.pixels.toSeq == samples.toSeq)
    // splice a LIST chunk between fmt and data: the walk must skip it
    val bb = java.nio.ByteBuffer.allocate(wav.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(wav, 0, 36)                             // RIFF..fmt chunk
    bb.put("LIST".getBytes(StandardCharsets.US_ASCII)).putInt(4)
    bb.put("INFO".getBytes(StandardCharsets.US_ASCII))
    bb.put(wav, 36, wav.length - 36)               // data chunk
    val spliced = bb.array()
    // fix the RIFF size field
    bb.putInt(4, spliced.length - 8)
    val f2 = Multimodal.decodeWav(spliced).get
    assert(f2.pixels.toSeq == samples.toSeq)
  }

  test("WAV decode rejects non-PCM and missing data") {
    val wav = Multimodal.encodeWav(8000, new Array[Byte](10))
    val nonPcm = wav.clone(); nonPcm(20) = 2 // audio format != 1
    assert(Multimodal.decodeWav(nonPcm).isEmpty)
    assert(Multimodal.decodeWav(wav.slice(0, 20)).isEmpty)
  }

  test("resize produces exactly the requested pixel count") {
    val f = Multimodal.DecodedFrame(10, 10,
      Array.tabulate[Byte](100)(_.toByte))
    val r = Multimodal.resizeStub(f, 8, 4)
    assert(r.width == 8 && r.height == 4 && r.pixels.length == 32)
    // repeats source bytes cyclically
    assert(r.pixels(0) == f.pixels(0) && r.pixels(31) == f.pixels(31 % 100))
  }

  test("frame sampling takes every nth row") {
    val f = Multimodal.DecodedFrame(10, 6, Array.tabulate[Byte](60)(_.toByte))
    val frames = Multimodal.sampleFramesStub(f, 2)
    assert(frames.length == 3) // rows 0, 2, 4
    assert(frames.head.pixels.toSeq == f.pixels.slice(0, 10).toSeq)
  }

  test("feature extraction decodes real headers: geometry matches encode") {
    val feats = Multimodal.extractFeatures(
      spark, Multimodal.assets(spark, Sf0001)).collect()
    assert(feats.length == 500) // every asset decodes — none dropped
    feats.foreach { f =>
      assert(math.abs(f.histogram.sum - 1.0f) < 1e-3)
      assert(f.media_type ==
        Seq("image", "audio", "video")((f.asset_id % 3).toInt))
      if (f.media_type == "audio") {
        assert(f.height == 1)
        assert(f.n_bytes == 44 + f.width) // header + one byte per sample
      } else {
        assert(f.width == (f.asset_id % 31).toInt + 2)
        assert(f.height == (f.asset_id % 17).toInt + 2)
        val rowBytes = ((f.width * 3 + 3) / 4) * 4
        assert(f.n_bytes == 54 + rowBytes.toLong * f.height)
      }
    }
  }

  test("features never carry the binary column (column pruning check)") {
    val df = Multimodal.extractFeatures(
      spark, Multimodal.assets(spark, Sf0001)).toDF()
    assert(!df.columns.contains("media"))
  }
}
