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

  test("mm4: exact dup implies perceptual dup; phash quantizes byte histogram") {
    val rows = graft.SparkEntry.queries("mm4_media_dedup")(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_size") <= r.getAs[Long]("percep_size"),
        "an exact-payload cluster can never be split by the coarser phash")
    }
    // exact dups share phash: group by exact_fp, all phashes equal within
    rows.groupBy(_.getAs[String]("exact_fp")).values.foreach { g =>
      assert(g.map(_.getAs[String]("phash")).distinct.length === 1)
    }
    // perceptual clustering is strictly coarser somewhere at this sf
    // (distinct texts with identical quantized byte histograms exist)
    assert(rows.map(_.getAs[String]("phash")).distinct.length <
      rows.map(_.getAs[String]("exact_fp")).distinct.length)
  }
}
