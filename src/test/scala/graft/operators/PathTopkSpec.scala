package graft.operators

import graft.SparkSpec

/** path_topk: journey prefixes replayed by hand, the (ts, event_id)
  * tie-break, short journeys kept, both knobs and loud guards.
  * Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class PathTopkSpec extends SparkSpec {

  private def ev(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "ts_s", "event_id", "event_type")
      .selectExpr("user_id", "CAST(timestamp_seconds(ts_s) AS TIMESTAMP) AS ts",
        "event_id", "event_type")
  }

  private def top(depth: Int, k: Int, rows: (Long, Long, Long, String)*) =
    EventOps.pathTopK(ev(rows: _*), depth, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("journey prefixes replay by hand; short journeys are kept") {
    val got = top(3, 10,
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "buy"),
      (1L, 40L, 4L, "logout"), // beyond depth: ignored
      (2L, 10L, 5L, "view"), (2L, 20L, 6L, "click"), (2L, 30L, 7L, "buy"),
      (3L, 10L, 8L, "view"), (3L, 20L, 9L, "bounce"))
    assert(got == Seq(("view>click>buy", 2L, 666L), ("view>bounce", 1L, 333L)),
      "two full journeys collapse; the short journey is a real prefix")
  }

  test("equal timestamps break by event_id; depth truncates") {
    val got = top(2, 10,
      (1L, 10L, 2L, "b"), (1L, 10L, 1L, "a"), (1L, 10L, 3L, "c"))
    assert(got == Seq(("a>b", 1L, 1000L)),
      "order within the tie is event_id; depth 2 drops the third")
  }

  test("k bounds the report with the deterministic (count DESC, path ASC) tie-break") {
    val rows = Seq(
      (1L, 1L, 1L, "a"), (2L, 1L, 2L, "c"), (3L, 1L, 3L, "b"))
    assert(top(1, 2, rows: _*) == Seq(("a", 1L, 333L), ("b", 1L, 333L)),
      "all tied at 1: lexicographic path order decides the cut")
  }

  test("knob guards are loud") {
    intercept[IllegalArgumentException](EventOps.pathTopK(ev((1L, 1L, 1L, "a")), 0, 5))
    intercept[IllegalArgumentException](EventOps.pathTopK(ev((1L, 1L, 1L, "a")), 21, 5))
    intercept[IllegalArgumentException](EventOps.pathTopK(ev((1L, 1L, 1L, "a")), 3, 0))
  }
}
