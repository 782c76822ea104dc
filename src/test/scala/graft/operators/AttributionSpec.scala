package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** attribution_linear: the equal-split credit, the lookback boundary, the
  * direct bucket and the knobs pinned by hand. Cross-engine exactness is
  * the DuckDB oracle's job at sf0.01.
  */
class AttributionSpec extends SparkSpec {

  private def ev(rows: (Long, Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "t")
      .selectExpr("event_id", "user_id", "event_type", "CAST(t AS TIMESTAMP) AS ts")
  }

  test("credit splits equally; the window boundary is [p-H, p)") {
    val got = EventOps.attributionLinear(ev(
      (1L, 7L, "view", "2024-01-02 10:00:00"),
      (2L, 7L, "click", "2024-01-02 11:00:00"),
      (3L, 7L, "view", "2024-01-01 09:59:59"),   // 48h+1s before: OUT
      (4L, 7L, "purchase", "2024-01-03 10:00:00"),
      (5L, 7L, "click", "2024-01-03 10:00:00")), // not strictly before: OUT
      lookbackHours = 24L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("click", 1L, 500L), ("view", 1L, 500L)))
  }

  test("a touchless conversion credits the direct bucket in full") {
    val got = EventOps.attributionLinear(ev(
      (1L, 1L, "purchase", "2024-01-05 00:00:00"),
      (2L, 2L, "view", "2024-01-04 23:00:00"))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("(direct)", 1L, 1000L)),
      "another user's touch never credits; no-touch -> direct 1000")
  }

  test("trunc split leaves the documented remainder; users are isolated") {
    // 3 touches -> 333 each, 999 total
    val got = EventOps.attributionLinear(ev(
      (1L, 1L, "view", "2024-01-02 01:00:00"),
      (2L, 1L, "view", "2024-01-02 02:00:00"),
      (3L, 1L, "click", "2024-01-02 03:00:00"),
      (4L, 1L, "purchase", "2024-01-02 04:00:00"))).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq == Seq(("click", 333L), ("view", 666L)))
  }

  test("touchTypes and convType are knobs; bad knobs are loud") {
    val e = ev(
      (1L, 1L, "signup", "2024-01-02 01:00:00"),
      (2L, 1L, "error", "2024-01-02 02:00:00"),
      (3L, 1L, "click", "2024-01-02 03:00:00"))
    val got = EventOps.attributionLinear(e,
      touchTypes = Seq("signup", "error"), convType = "click").collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq == Seq(("error", 500L), ("signup", 500L)))
    intercept[IllegalArgumentException](
      EventOps.attributionLinear(e, touchTypes = Seq("click"), convType = "click"))
    intercept[IllegalArgumentException](
      EventOps.attributionLinear(e, lookbackHours = 0L))
  }
}
