package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("media table carries binary payloads with typed metadata") {
    val m = Multimodal.mediaTable(spark, sf).collect()
    assert(m.length === 500)
    assert(m.forall(_.payload.nonEmpty))
    assert(m.map(_.mime).toSet ===
      Set("image/png", "audio/wav", "video/mp4"))
  }

  test("feature extraction is deterministic and batch-shaped") {
    val a = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().sortBy(_.media_id)
    assert(a.map(_.byte_entropy).toSeq === b.map(_.byte_entropy).toSeq)
    assert(a.forall(f => f.histogram.length === 16 &&
      math.abs(f.histogram.sum - 1.0) < 1e-3))
  }

  test("resize preserves ids and sets requested dimensions") {
    val r = Multimodal.resizeAll(Multimodal.mediaTable(spark, sf), 64, 64)
      .collect()
    assert(r.forall(m => m.width === 64 && m.height === 64))
    assert(r.length === 500)
  }

  test("frame sampling yields n frames per video only") {
    val media = Multimodal.mediaTable(spark, sf)
    val videos = media.collect().count(_.mime == "video/mp4")
    val frames = Multimodal.frameSample(media, 4).collect()
    assert(frames.length === videos * 4)
    assert(frames.groupBy(_.media_id).values.forall(_.length === 4))
  }
}
