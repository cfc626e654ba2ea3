package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming sessionization — the streaming face of batch
  * q24 (gap-split sessions), built on `session_window`: state per
  * (user, open session) only, merged and closed by the watermark, so
  * state is bounded by the number of concurrently-open sessions — never
  * by stream length. Append mode emits each session exactly once, when
  * the watermark passes its close.
  *
  * Boundary note vs batch q24: `session_window` closes a session when
  * the next event is >= gap after the previous (half-open window);
  * q24's lag-based split uses strictly > on whole seconds. Events
  * exactly ON the gap boundary differ — the streaming contract is the
  * standard half-open one. */
object StreamingSessions {

  /** Input needs (ts, user_id); emits one row per closed session:
    * (user_id, session_start, session_end, n_events). Works identically
    * on a batch frame (session_window is batch-capable), which is what
    * [[StreamingSessionsSpec]] pins: a stream and its batch backfill
    * produce the same closed sessions. */
  def sessionize(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
