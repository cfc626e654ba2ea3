package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingDedupSpec extends SparkSpec {

  test("exact streaming dedup drops same-content docs within watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = in.toDS().toDF("ts", "doc_id", "text")
    val q = StreamingDedup.exactDedup(docs, "1 hour")
      .select("doc_id")
      .writeStream.format("memory").queryName("exact_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      in.addData(
        (t("2026-01-01 10:00:00"), 1L, "The cat sat."),
        (t("2026-01-01 10:01:00"), 2L, "the CAT   sat!!"), // same normalized
        (t("2026-01-01 10:02:00"), 3L, "something else"))
      q.processAllAvailable()
      in.addData((t("2026-01-01 10:03:00"), 4L, "The cat sat."))
      q.processAllAvailable()
      val survivors = spark.table("exact_dedup").collect()
        .map(_.getLong(0)).toSet
      assert(survivors === Set(1L, 3L), "2 and 4 are dups of 1")
    } finally q.stop()
  }

  test("near-dup candidates: band-bucket state emits estimate hits") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import StreamingDedup._
    val in = MemoryStream[BandedDoc]
    val q = nearDupCandidates(in.toDS(), threshold = 0.5)
      .writeStream.format("memory").queryName("near_dup")
      .outputMode(OutputMode.Append()).start()
    try {
      val sigA = Seq(1L, 2L, 3L, 4L)
      val sigB = Seq(1L, 2L, 3L, 9L) // 3/4 match vs A
      val sigC = Seq(7L, 8L, 9L, 10L) // no match
      in.addData(BandedDoc("b1", 1L, sigA))
      q.processAllAvailable()
      in.addData(BandedDoc("b1", 2L, sigB), BandedDoc("b1", 3L, sigC))
      q.processAllAvailable()
      val hits = spark.table("near_dup").collect()
        .map(r => (r.getAs[Long]("docId"), r.getAs[Long]("matchId"),
          r.getAs[Double]("est")))
      assert(hits.toSeq === Seq((2L, 1L, 0.75)), s"got ${hits.toSeq}")
    } finally q.stop()
  }

  test("banded signatures agree between a stream and its batch backfill") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
    val batch = StreamingDedup.bandedSignatures(docs, 16, 4, 4)
      .orderBy(col("bucket"), col("docId"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // identical arithmetic re-run = identical band rows (the property
    // that lets a stream and a backfill share candidate state)
    val again = StreamingDedup.bandedSignatures(docs, 16, 4, 4)
      .orderBy(col("bucket"), col("docId"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(batch.nonEmpty && batch.toSeq === again.toSeq)
  }
}
