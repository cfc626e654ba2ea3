package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingSessionsSpec extends SparkSpec {

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("session_window stream closes gap-split sessions and matches batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      (t("2026-01-01 10:00:00"), 1L),
      (t("2026-01-01 10:10:00"), 1L), // same session (10 min gap)
      (t("2026-01-01 11:30:00"), 1L), // new session (80 min gap)
      (t("2026-01-01 10:05:00"), 2L))
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val q = StreamingSessions.sessionize(
        in.toDS().toDF("ts", "user_id"), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      // push the watermark far past every session end to close them all
      in.addData((t("2026-01-01 20:00:00"), 9L))
      q.processAllAvailable()
      val streamed = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3)))
        .sortBy(x => (x._1, x._2.getTime))
      val closed = streamed.filter(_._1 != 9L)
      assert(closed.toSeq === Seq(
        (1L, t("2026-01-01 10:00:00"), 2L),
        (1L, t("2026-01-01 11:30:00"), 1L),
        (2L, t("2026-01-01 10:05:00"), 1L)))
      // batch backfill through the same code path agrees
      val batch = StreamingSessions.sessionize(
          rows.toDF("ts", "user_id"), "30 minutes", "10 minutes")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3)))
        .sortBy(x => (x._1, x._2.getTime))
      assert(batch.toSeq === closed.toSeq,
        "stream and batch sessionization must agree on closed sessions")
    } finally q.stop()
  }
}
