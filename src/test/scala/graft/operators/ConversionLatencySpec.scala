package graft.operators

import graft.SparkSpec

/** conversion_latency: the ordered-funnel latency replayed by hand —
  * pre-view purchases never count, the second quantization, exact type-1
  * quantiles, the funnel-end knobs and loud guards. Cross-engine
  * exactness is the DuckDB oracle's job at sf0.01.
  */
class ConversionLatencySpec extends SparkSpec {

  private def ev(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "ts_s", "event_type")
      .selectExpr("user_id", "CAST(timestamp_seconds(ts_s) AS TIMESTAMP) AS ts",
        "event_type")
  }

  private def report(rows: (Long, Long, String)*) = {
    val r = EventOps.conversionLatency(ev(rows: _*)).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("latencies replay by hand; the order constraint is enforced") {
    // u1 converts in 10 s; u2 in 30 s; u3 purchased BEFORE viewing: not a
    // conversion; u4 viewed, never purchased
    val got = report(
      (1L, 100L, "view"), (1L, 110L, "purchase"),
      (2L, 100L, "view"), (2L, 130L, "purchase"),
      (3L, 200L, "purchase"), (3L, 210L, "view"),
      (4L, 100L, "view"))
    // type-1 over {10, 30}: p50 = ceil(1.0) -> 10; p90 = ceil(1.8) -> 30
    assert(got == ((2L, 10L, 10L, 30L, 30L)))
  }

  test("first view and first subsequent purchase anchor the measurement") {
    // later views don't reset the clock; the first post-view purchase wins
    val got = report(
      (1L, 100L, "view"), (1L, 500L, "view"),
      (1L, 160L, "purchase"), (1L, 900L, "purchase"))
    assert(got == ((1L, 60L, 60L, 60L, 60L)))
  }

  test("the funnel ends are knobs; guards are loud") {
    val got = EventOps.conversionLatency(
      ev((1L, 100L, "signup"), (1L, 400L, "click")), "signup", "click")
      .collect()(0)
    assert(got.getLong(0) == 1L && got.getLong(1) == 300L)
    intercept[IllegalArgumentException](
      EventOps.conversionLatency(ev((1L, 1L, "view")), "view", "view"))
  }
}
