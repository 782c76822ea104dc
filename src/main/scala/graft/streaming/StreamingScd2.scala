package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD type-2 dimension history: the intake twin of the batch
  * `scd2_history` operator — the reference's dim UPSERT stream
  * (overwrite-latest) upgraded to an auditable version history, closed
  * intervals emitted AS the attribute changes instead of nightly.
  *
  * State design: ONE `Scd2Open` row per dimension key — the open
  * version's attribute, validity start, collapsed-update count and the
  * last (ts, seq) processed. That is exactly the cardinality any dim
  * store already holds (the key domain), so no TTL applies: dimensions
  * live as long as their keys do. Within a micro-batch the group's
  * events sort by (ts_us, seq) — the batch operator's total order — and
  * replay/late events at or before the last processed (ts, seq) DROP
  * (the late-data rule; an at-least-once upstream re-delivery is
  * absorbed instead of double-counting `n_rows` or emitting phantom
  * versions, the idempotent-consumer move).
  *
  * Output (append mode): CLOSED versions only, schema-compatible with
  * the batch operator's closed rows (key, version, valid_from_us,
  * valid_to_us, attr, n_rows). The open version is the state itself —
  * StreamingScd2Spec pins closed-row equality against
  * `Extras.scd2History` over the concatenated changelog, cross-batch
  * collapse (same attr across batches never closes), the late drop and
  * restart recovery.
  */
object StreamingScd2 {

  case class Scd2Event(key: Long, ts_us: Long, seq: Long, attr: String)

  /** The open version per key — nRows counts collapsed raw updates. */
  case class Scd2Open(attr: Option[String], validFromUs: Long, nRows: Long,
      version: Int, lastTsUs: Long, lastSeq: Long)

  case class Scd2Closed(key: Long, version: Int, valid_from_us: Long,
      valid_to_us: Long, attr: Option[String], n_rows: Long)

  /** Closed-version stream of a `(key, ts_us, seq, attr)` changelog. */
  def closedVersions(changelog: DataFrame): Dataset[Scd2Closed] = {
    val spark = changelog.sparkSession
    import spark.implicits._
    changelog.as[Scd2Event]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, events: Iterator[Scd2Event], state: GroupState[Scd2Open]) =>
          val sorted = events.toSeq.sortBy(e => (e.ts_us, e.seq))
          var open = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[Scd2Closed]()
          sorted.foreach { e =>
            open match {
              case None =>
                open = Some(Scd2Open(Option(e.attr), e.ts_us, 1L, 1, e.ts_us, e.seq))
              case Some(o) =>
                val late = e.ts_us < o.lastTsUs ||
                  (e.ts_us == o.lastTsUs && e.seq <= o.lastSeq)
                if (late) () // replay or straggler: absorbed, never emitted
                else if (Option(e.attr) == o.attr)
                  open = Some(o.copy(nRows = o.nRows + 1,
                    lastTsUs = e.ts_us, lastSeq = e.seq))
                else {
                  out += Scd2Closed(key, o.version, o.validFromUs, e.ts_us,
                    o.attr, o.nRows)
                  open = Some(Scd2Open(Option(e.attr), e.ts_us, 1L,
                    o.version + 1, e.ts_us, e.seq))
                }
            }
          }
          open.foreach(state.update)
          out.iterator
      }
  }
}
