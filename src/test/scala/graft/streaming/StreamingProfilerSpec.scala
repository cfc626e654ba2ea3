package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingProfilerSpec extends SparkSpec {

  test("running profile updates across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(String, String)]
    val q = StreamingProfiler
      .runningProfile(in.toDS().toDF("col_name", "value"))
      .writeStream.format("memory").queryName("running_profile")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(("c1", "aa"), ("c1", "bbbb"), ("c2", ""))
      q.processAllAvailable()
      in.addData(("c1", "cc"))
      q.processAllAvailable()
      val rows = spark.table("running_profile").collect()
        .map(r => r.getAs[String]("col_name") ->
          (r.getAs[Long]("n_values"), r.getAs[Long]("n_nonempty"),
            r.getAs[Long]("min_len"), r.getAs[Long]("max_len"))).toMap
      assert(rows("c1") === ((3L, 3L, 2L, 4L)))
      assert(rows("c2") === ((1L, 0L, 0L, 0L)))
    } finally q.stop()
  }

  test("windowed event profile aggregates per window and type") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(java.sql.Timestamp, String, Double, Long)]
    val df = in.toDS().toDF("ts", "event_type", "value", "user_id")
    val q = StreamingProfiler.windowedEventProfile(df, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("windowed_profile")
      .outputMode(OutputMode.Update()).start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      in.addData(
        (t("2026-01-01 10:05:00"), "click", 1.0, 1L),
        (t("2026-01-01 10:20:00"), "click", 2.0, 2L),
        (t("2026-01-01 11:10:00"), "view", 5.0, 1L))
      q.processAllAvailable()
      val rows = spark.table("windowed_profile").collect()
      assert(rows.length === 2)
      val click = rows.find(_.getAs[String]("event_type") == "click").get
      assert(click.getAs[Long]("n_events") === 2L)
      assert(click.getAs[Double]("sum_value") === 3.0)
    } finally q.stop()
  }

  test("stateful profile keeps running min/mean/max per column") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import StreamingProfiler._
    val in = MemoryStream[CellEvent]
    val q = statefulProfile(in.toDS())
      .writeStream.format("memory").queryName("stateful_profile")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(CellEvent("c1", "ab"), CellEvent("c1", "abcd"))
      q.processAllAvailable()
      in.addData(CellEvent("c1", "x"))
      q.processAllAvailable()
      val last = spark.table("stateful_profile").collect()
        .filter(_.getAs[String]("colName") == "c1")
        .maxBy(_.getAs[Long]("n"))
      assert(last.getAs[Long]("n") === 3L)
      assert(last.getAs[Long]("minLen") === 1L)
      assert(last.getAs[Long]("maxLen") === 4L)
      assert(math.abs(last.getAs[Double]("meanLen") - 7.0 / 3) < 1e-9)
    } finally q.stop()
  }
}
