package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingQualitySpec extends SparkSpec {

  test("streaming quality+scrub equals its batch backfill row for row") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and the cat."),
      (2L, "!!! ??? *** ### $$$ %%%"),
      (3L, "mail me at alice@example.com or call 555-123-4567 please"),
      (4L, "a"))
    // stream side
    val in = MemoryStream[(Long, String)]
    val q = StreamingQuality.qualityScrub(in.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("stream_quality")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_quality").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getString(4))).sortBy(_._1)
      // batch backfill over the same rows, same code path
      val batch = StreamingQuality.qualityScrub(rows.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getString(4))).sortBy(_._1)
      assert(streamed.toSeq === batch.toSeq,
        "stream and batch must produce identical quality/scrub rows")
      val byId = streamed.map(t => t._1 -> t).toMap
      assert(byId(2L)._4 === 0L, "punctuation noise must be dropped")
      assert(byId(1L)._4 === 1L, "clean prose must be kept")
      assert(!byId(3L)._5.contains("@") && byId(3L)._5.contains("[EMAIL]")
        && byId(3L)._5.contains("[PHONE]"), byId(3L)._5)
    } finally q.stop()
  }
}
