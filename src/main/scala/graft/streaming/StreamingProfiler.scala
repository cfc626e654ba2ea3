package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Structured-Streaming extension: incremental column profiling over a
  * stream of (col_name, value) cells. The reference has no streaming
  * surface (SURVEY §2.13) — this is the engine's scale path for
  * continuously-arriving data: profiles update per micro-batch with
  * state bounded by O(#columns), and distinct counts switch to
  * HyperLogLog (`approx_count_distinct`) because exact distinct state
  * would grow with the data. */
object StreamingProfiler {

  /** Running per-column profile as a streaming aggregation (update
    * mode). State per column is constant-size. */
  def runningProfile(melted: DataFrame): DataFrame = {
    val v = col("value")
    val nonEmpty = v.isNotNull && length(trim(v)) > 0
    melted.groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_values"),
        sum(when(nonEmpty, 1L).otherwise(0L)).as("n_nonempty"),
        approx_count_distinct(lower(trim(v))).as("approx_unique"),
        sum(length(v)).as("sum_len"),
        min(length(v)).as("min_len"),
        max(length(v)).as("max_len"))
  }

  /** Event-time windowed profile with a watermark: per (window, type)
    * counts + value stats, the streaming analogue of q12_events_daily. */
  def windowedEventProfile(events: DataFrame, windowLen: String,
      watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))

  /** Custom running state per column via mapGroupsWithState: welford-style
    * mean/min/max of value length, demonstrating arbitrary stateful
    * profiling beyond built-in aggregates. */
  final case class CellEvent(colName: String, value: String)
  final case class ColState(n: Long, meanLen: Double, minLen: Long, maxLen: Long)
  final case class ColProfile(colName: String, n: Long, meanLen: Double,
      minLen: Long, maxLen: Long)

  def statefulProfile(cells: Dataset[CellEvent]): Dataset[ColProfile] = {
    import cells.sparkSession.implicits._
    cells.groupByKey(_.colName)
      .mapGroupsWithState[ColState, ColProfile] {
        (key: String, events: Iterator[CellEvent], state: GroupState[ColState]) =>
          var s = state.getOption.getOrElse(ColState(0L, 0.0, Long.MaxValue, 0L))
          events.foreach { e =>
            val len = if (e.value == null) 0L else e.value.length.toLong
            val n1 = s.n + 1
            s = ColState(n1, s.meanLen + (len - s.meanLen) / n1,
              math.min(s.minLen, len), math.max(s.maxLen, len))
          }
          state.update(s)
          ColProfile(key, s.n, s.meanLen, s.minLen, s.maxLen)
      }
  }
}
