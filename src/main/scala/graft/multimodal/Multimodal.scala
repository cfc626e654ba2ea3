package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column support: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-batched passes.
  *
  * The decode step is a clearly-marked STUB (this environment has no
  * image/audio codecs): [[StubCodec.decode]] produces a deterministic
  * fake decode from the payload bytes. Everything around it — the
  * binary-column schema, metadata struct, mapPartitions batch shape,
  * per-frame explode — is real Spark plumbing, so swapping in a real
  * codec is a one-function change. */
object Multimodal {

  final case class MediaRecord(
      media_id: Long, mime: String, payload: Array[Byte],
      width: Int, height: Int)

  final case class MediaFeatures(
      media_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, byte_entropy: Double,
      histogram: Array[Double])

  final case class Frame(media_id: Long, frame_no: Int, payload: Array[Byte])

  /** STUB codec — replace with a real image/audio library in production.
    * Deterministic: all outputs derive from the payload bytes alone. */
  object StubCodec {
    final case class Decoded(width: Int, height: Int, pixels: Array[Byte])
    def decode(payload: Array[Byte]): Decoded = {
      // fake dimensions from stable byte statistics
      val h = math.floorMod(java.util.Arrays.hashCode(payload), 480) + 16
      val w = math.floorMod(h * 31 + payload.length, 640) + 16
      Decoded(w, h, payload)
    }
    def resize(d: Decoded, w: Int, h: Int): Decoded =
      Decoded(w, h, d.pixels.take(math.max(1, math.min(d.pixels.length, w * h / 64))))
  }

  /** Synthesize a media table from the documents corpus: text bytes act
    * as the opaque payload; mime rotates deterministically. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.table(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("mime"),
        // coalesce: a NULL-text doc is a zero-byte media file (real
        // ingests have them), not a null payload the codec NPEs on;
        // the mm oracles coalesce identically
        encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, mime, payload) =>
        val d = StubCodec.decode(payload)
        MediaRecord(id, mime, payload, d.width, d.height)
      }
  }

  /** Feature extraction in partition batches (the Scala analogue of a
    * batched pandas UDF): iterate each partition, compute per-record
    * byte-level features; one output row per media. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val counts = new Array[Long](16)
        m.payload.foreach(b => counts((b & 0xFF) >> 4) += 1)
        val n = m.payload.length.toDouble
        val hist = counts.map(c => if (n == 0) 0.0 else c / n)
        val entropy = -hist.filter(_ > 0).map(p => p * math.log(p)).sum
        MediaFeatures(m.media_id, m.mime, m.payload.length.toLong,
          m.width, m.height,
          math.floor(entropy * 1e6 + 0.5) / 1e6,
          hist.map(p => math.floor(p * 1e6 + 0.5) / 1e6))
      }
    }
  }

  /** Resize pass (stub decode -> stub resize), preserving schema. */
  def resizeAll(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val r = StubCodec.resize(StubCodec.decode(m.payload), w, h)
      MediaRecord(m.media_id, m.mime, r.pixels, r.width, r.height)
    }
  }

  /** Frame sampling for video payloads: n evenly-spaced byte windows
    * stand in for decoded frames (explode: one row per frame). */
  def frameSample(media: Dataset[MediaRecord], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.mime.startsWith("video/")).flatMap { m =>
      val len = m.payload.length
      if (len == 0) Nil
      else (0 until n).map { i =>
        val start = (len.toLong * i / n).toInt
        val end = math.min(len, start + math.max(1, len / n))
        Frame(m.media_id, i, java.util.Arrays.copyOfRange(m.payload, start, end))
      }
    }
  }
}
