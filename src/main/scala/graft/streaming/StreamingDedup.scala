package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.text.Text

/** Structured-Streaming deduplication over a document stream — the
  * streaming face of the batch d1/d2 operators (the reference has no
  * streaming surface; this is the engine's continuously-arriving-data
  * path for training-corpus construction).
  *
  * Scale design: exact dedup keys state by content fingerprint with an
  * event-time watermark so state is bounded by the dedup horizon, not
  * the stream length; the near-dup path keys state by MinHash band
  * buckets (same banding as batch d2), so a new document only ever
  * compares against its colliding buckets' signature lists, each capped
  * at [[MaxBucketState]]. */
object StreamingDedup {

  /** Exact streaming dedup: first document per normalized-content
    * fingerprint survives; duplicates inside the watermark horizon are
    * dropped. `dropDuplicatesWithinWatermark` keeps fingerprint state
    * only until the watermark passes it — bounded state, the standard
    * streaming-dedup contract. Input needs an event-time `ts` column. */
  def exactDedup(docs: DataFrame, watermark: String): DataFrame = {
    docs.withColumn("fp", md5(graft.text.Text.normText(col("text"))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
  }

  /** Cap on per-bucket signature state for the near-dup path. */
  val MaxBucketState = 50

  final case class BandedDoc(bucket: String, docId: Long, mh: Seq[Long])
  final case class BucketState(docs: List[(Long, Seq[Long])])
  final case class NearDupHit(bucket: String, docId: Long, matchId: Long,
      est: Double)

  /** Streaming near-dup candidates via MinHash band buckets +
    * flatMapGroupsWithState: per band bucket, keep the last
    * [[MaxBucketState]] (docId, signature) pairs; each arriving
    * signature emits hits whose matching-minhash share >= `threshold`.
    * Emits one hit per (bucket, doc, match) — downstream dedups pairs
    * across buckets exactly like batch d2's distinct. */
  def nearDupCandidates(banded: Dataset[BandedDoc], threshold: Double)
      : Dataset[NearDupHit] = {
    import banded.sparkSession.implicits._
    banded.groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, NearDupHit](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (bucket: String, events: Iterator[BandedDoc],
            state: GroupState[BucketState]) =>
          var s = state.getOption.getOrElse(BucketState(Nil))
          val hits = scala.collection.mutable.ListBuffer.empty[NearDupHit]
          events.foreach { e =>
            s.docs.foreach { case (otherId, otherMh) =>
              if (otherId != e.docId) {
                val k = math.min(otherMh.length, e.mh.length)
                var same = 0
                var i = 0
                while (i < k) {
                  if (otherMh(i) == e.mh(i)) same += 1
                  i += 1
                }
                val est = if (k == 0) 0.0 else same.toDouble / k
                if (est >= threshold)
                  hits += NearDupHit(bucket, e.docId, otherId, est)
              }
            }
            s = BucketState(((e.docId, e.mh) :: s.docs).take(MaxBucketState))
          }
          state.update(s)
          hits.iterator
      }
  }

  /** Batch/stream-shared prep: (bucket, docId, mh) band rows from raw
    * documents — identical shingle/signature/band arithmetic to batch
    * d2, so a stream and a backfill produce the same candidates. */
  def bandedSignatures(docs: DataFrame, minhashK: Int, bands: Int,
      rows: Int): DataFrame = {
    // words bound first + cheap emptiness filter — see DedupQueries.shingled
    docs.withColumn("w", Text.words(col("text")))
      .filter(size(col("w")) >= 2)
      .withColumn("sh", Text.wordShingles(col("w"), 2))
      .withColumn("mh", Text.minhash(col("sh"), minhashK))
      .select(col("doc_id").as("docId"), col("mh"),
        explode(Text.bandKeys(col("mh"), bands, rows)).as("bucket"))
      .select(col("bucket"), col("docId"), col("mh"))
  }
}
