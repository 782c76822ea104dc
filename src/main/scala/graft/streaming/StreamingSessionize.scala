package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native streaming session windows: the engine-managed twin of the batch
  * `session_window_agg` / `sessionize` pair (reference sessionization:
  * gmall-realtime visitor/bounce jobs sessionize by page gap). Spark's
  * `session_window` MERGES windows as events arrive — two events landing in
  * different micro-batches within the gap become ONE session in the state
  * store — and the watermark CLOSES sessions: in append mode a session row
  * is emitted exactly once, when the watermark passes its end (last event
  * + gap). That merge-then-close lifecycle is what the reference's
  * hand-rolled keyed-state sessionizers implement manually; here it rides
  * the engine's session-window state format (RocksDB-backed, exactly-once
  * across restarts — the checkpointed store, no custom state code).
  *
  * Scale shape: state is bounded by OPEN sessions inside the watermark
  * horizon (closed sessions evict on emission), keyed by (user, window) —
  * hash-partitioned across executors like any streaming aggregate; each
  * micro-batch does a partial per-key pre-aggregation before the state
  * update. Nothing history-sized is retained.
  *
  * ONE aggregation definition ([[sessionAgg]]) serves the streaming query
  * and its batch contract: StreamingSessionizeSpec pins the append-mode
  * emissions doc-for-doc against [[sessionAgg]] run as a plain batch over
  * the same (non-late) events.
  */
object StreamingSessionize {

  /** The session aggregation: 30-min-gap-style sessions per user with
    * event count and [start, end) bounds in epoch micros. Works on a
    * static frame (batch contract) or a watermarked stream. */
  def sessionAgg(events: DataFrame, gapSeconds: Int): DataFrame = {
    require(gapSeconds >= 1, s"gapSeconds must be >= 1, got $gapSeconds")
    events
      .groupBy(session_window(col("ts"), s"$gapSeconds seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
  }

  /** Watermarked streaming form over an (user_id, ts: timestamp) stream:
    * append mode emits each session once, when the watermark (max event
    * time − `delaySeconds`) passes the session end. Events older than the
    * watermark are dropped by the engine — the documented late-data
    * contract of every watermarked aggregate here. */
  def sessions(events: DataFrame, gapSeconds: Int = 1800,
      delaySeconds: Int = 10): DataFrame = {
    require(delaySeconds >= 0, s"delaySeconds must be >= 0, got $delaySeconds")
    sessionAgg(events.withWatermark("ts", s"$delaySeconds seconds"), gapSeconds)
  }
}
