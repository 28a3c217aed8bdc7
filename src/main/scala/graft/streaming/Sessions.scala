package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the same native `session_window` gap
  * semantics as the batch operator (`Analytics.userSessions`, q49), made
  * streamable by an event-time watermark.
  *
  * Sessions are open-ended state: a new event inside the gap EXTENDS its
  * session, so a session can only be emitted once no in-watermark event
  * can still reach it — append mode holds each session until the
  * watermark passes `session_end` (last event + gap). State is one
  * merged-session row per open (user, session), dropped at emission;
  * Spark's session-window state store merges overlapping candidate
  * sessions per key at each micro-batch, so state size tracks OPEN
  * sessions, not events.
  */
object Sessions {

  /** Sessionize an event stream with columns (user_id, ts, value). Works
    * unchanged on a batch frame (watermark is a no-op there), which is
    * what keeps the streaming semantics oracle-adjacent: the closed
    * sessions a stream emits are exactly the batch result's rows once the
    * watermark passes them — asserted in StreamingSpec. */
  def sessionize(events: DataFrame,
                 gapMinutes: Int = 30,
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"),
        col("total_value"))
}
