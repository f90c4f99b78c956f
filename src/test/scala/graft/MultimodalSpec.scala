package graft

import java.nio.charset.StandardCharsets

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decode stub is deterministic and dimension formula holds") {
    val bytes = "hello multimodal world".getBytes(StandardCharsets.UTF_8)
    val f1 = Multimodal.decodeStub(bytes)
    val f2 = Multimodal.decodeStub(bytes)
    assert(f1.width == f2.width && f1.height == f2.height)
    assert(f1.width == math.max(1, bytes.length % 64))
    assert(f1.height == (bytes.length / 64) + 1)
  }

  test("resize produces exactly the requested pixel count") {
    val f = Multimodal.decodeStub(Array.tabulate[Byte](100)(_.toByte))
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

  test("feature extraction: histogram sums to ~1 and widths match the stub") {
    val feats = Multimodal.extractFeatures(
      spark, Multimodal.assets(spark, Sf0001)).collect()
    assert(feats.length == 500)
    feats.take(20).foreach { f =>
      assert(math.abs(f.histogram.sum - 1.0f) < 1e-3)
      assert(f.width == math.max(1, (f.n_bytes % 64).toInt))
      assert(f.media_type == Seq("image", "audio", "video")((f.asset_id % 3).toInt))
    }
  }

  test("features never carry the binary column (column pruning check)") {
    val df = Multimodal.extractFeatures(
      spark, Multimodal.assets(spark, Sf0001)).toDF()
    assert(!df.columns.contains("media"))
  }
}
