package graft.streaming

import LogSchema.LogEvent
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** P5 — bounce (user-jump) detection: timeout-as-answer CEP.
  *
  * Reference: RT/app/dwm/UserJumpDetailApp.java:101-159 — pattern = session
  * entry (`last_page_id` empty) followed by NO page event within 10 s; the
  * *timed-out* partial matches are the result (the matched pairs are
  * discarded). Spark has no CEP, so the pattern is encoded directly in
  * `flatMapGroupsWithState` with an event-time timeout: buffer the entry,
  * cancel on any successor within the window, emit on watermark-fired
  * timeout (SURVEY.md §2.6). Requires a watermark on the event-time column.
  */
object BounceDetect {

  val BounceWindowMs = 10000L // Pattern.within(10 s), UserJumpDetailApp.java:128

  def detectState(
      mid: String,
      rows: Iterator[LogEvent],
      state: GroupState[LogEvent]): Iterator[LogEvent] = {
    if (rows.isEmpty && state.hasTimedOut) {
      val pending = state.get
      state.remove()
      return Iterator.single(pending) // no successor arrived: bounce
    }
    val sorted = rows.toIndexedSeq.sortBy(_.ts)
    var pending = state.getOption
    val bounces = Seq.newBuilder[LogEvent]
    sorted.foreach { e =>
      // only a TRUE successor (e.ts >= pending.ts) resolves the pending
      // entry: flatMapGroupsWithState does not auto-drop late rows, and a
      // straggler from BEFORE the entry must not suppress a real bounce.
      // DELIBERATE trade-off: a straggler that is ITSELF an entry candidate
      // (ts < pending.ts) is dropped, never buffered — with one pending
      // entry per mid we cannot tell whether its 10 s window was already
      // resolved by events processed (and forgotten) in earlier batches, so
      // emitting it would risk false-positive bounces. This mirrors the
      // reference CEP's late-data drop at the watermark
      // (UserJumpDetailApp.java:80-88, monotonic watermark): an event older
      // than state Flink would have discarded outright.
      val resolves = pending.exists(p => e.ts >= p.ts)
      pending.foreach { p =>
        if (resolves && e.ts - p.ts > BounceWindowMs) bounces += p // successor too late
      }
      if (resolves) pending = None
      if (e.lastPageId.isEmpty && pending.isEmpty) pending = Some(e) // new entry candidate
    }
    pending match {
      case Some(p) =>
        state.update(p)
        // clamp to just past the current watermark: registering a timeout
        // AT or BEFORE the watermark throws IllegalArgumentException and
        // kills the query — reachable via a straggler entry whose 10 s
        // window already elapsed (watermark >= ts + 10 s). The clamp fires
        // the timeout in the next batch instead: the entry had no
        // successor inside its window, so the immediate bounce emission is
        // exactly the right answer, just delivered late.
        val wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(math.max(p.ts + BounceWindowMs, wm + 1))
      case None if state.exists => state.remove()
      case None =>
    }
    bounces.result().iterator
  }

  /** events must carry a watermarked event-time column when streaming; use
    * [[withEventTime]] to attach one from the epoch-millis `ts`. */
  def apply(events: Dataset[LogEvent]): Dataset[LogEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.mid)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(detectState)
  }

  /** Attach + watermark an event-time column (monotonic watermark parity
    * with WatermarkStrategy.forMonotonousTimestamps, UserJumpDetailApp:80-88). */
  def withEventTime(df: DataFrame, delay: String = "0 seconds"): DataFrame =
    df.withColumn("ets", timestamp_millis(col("ts"))).withWatermark("ets", delay)
}
