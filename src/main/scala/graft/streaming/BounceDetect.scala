package graft.streaming

import LogSchema.LogEvent
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** P5 — bounce (user-jump) detection: timeout-as-answer CEP.
  *
  * Reference: RT/app/dwm/UserJumpDetailApp.java:101-159 — pattern = session
  * entry (`last_page_id` empty) followed by NO page event within 10 s; the
  * *timed-out* partial matches are the result (the matched pairs are
  * discarded). Expressed as a [[Sequence.Pattern]] over the reusable CEP
  * state machine (SURVEY.md §2.6): anchor = entry, one strict successor
  * (any event), `within` 10 s, `emitTimedOut` — so the operator is pure
  * config, and the next reference pattern is another `Pattern` value, not
  * another hand-rolled flatMapGroupsWithState.
  */
object BounceDetect {

  val BounceWindowMs = 10000L // Pattern.within(10 s), UserJumpDetailApp.java:128

  /** The bounce pattern: timed-out partials ARE the answer; completed
    * entry→successor matches are discarded (emitMatched = false). */
  val pattern: Sequence.Pattern[LogEvent] = Sequence.Pattern(
    steps = IndexedSeq(_.lastPageId.isEmpty, _ => true),
    withinMs = BounceWindowMs,
    eventTs = _.ts,
    emitTimedOut = true,
    emitMatched = false)

  /** events must carry a watermarked event-time column when streaming; use
    * [[withEventTime]] to attach one from the epoch-millis `ts`. */
  def apply(events: Dataset[LogEvent]): Dataset[LogEvent] = {
    import events.sparkSession.implicits._
    Sequence.detect(events, pattern)(_.mid)
  }

  /** Attach + watermark an event-time column (monotonic watermark parity
    * with WatermarkStrategy.forMonotonousTimestamps, UserJumpDetailApp:80-88). */
  def withEventTime(df: DataFrame, delay: String = "0 seconds"): DataFrame =
    df.withColumn("ets", timestamp_millis(col("ts"))).withWatermark("ets", delay)
}
