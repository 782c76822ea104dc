package graft.operators

import graft.SparkSpec

/** event_path_lift: the transition-lift arithmetic pinned on a hand
  * clickstream — lift_ppm = c12·T·10⁶ div (c_from·c_to), per-user
  * consecutive pairs only, min-count prune. Cross-engine exactness is
  * the DuckDB oracle's job at sf0.01.
  */
class TransitionLiftSpec extends SparkSpec {

  private def events(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "us", "event_id", "event_type")
      .selectExpr("user_id", "timestamp_micros(us) AS ts", "event_id",
        "event_type")
  }

  test("hand-computed lift; the rare exclusive transition out-lifts the bulk one") {
    // u1: a b a b -> (a,b),(b,a),(a,b); u2: a b -> (a,b). T = 4
    // ab: c12=3, c_from(a)=3, c_to(b)=3 -> 3*4e6 div 9  = 1333333
    // ba: c12=1, c_from(b)=1, c_to(a)=1 -> 1*4e6 div 1  = 4000000
    val ev = events(
      (1L, 1000L, 1L, "a"), (1L, 2000L, 2L, "b"),
      (1L, 3000L, 3L, "a"), (1L, 4000L, 4L, "b"),
      (2L, 1000L, 5L, "a"), (2L, 2000L, 6L, "b"))
    val got = EventOps.transitionLift(ev, minCount = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(("a", "b")) == (3L, 3L, 3L, 1333333L))
    assert(got(("b", "a")) == (1L, 1L, 1L, 4000000L))
  }

  test("transitions never cross users") {
    // u1 ends in 'a', u2 starts with 'b' — no (a,b) edge between them
    val ev = events((1L, 1000L, 1L, "a"), (2L, 2000L, 2L, "b"))
    assert(EventOps.transitionLift(ev, minCount = 1).isEmpty)
  }

  test("minCount prunes below-threshold pairs") {
    val ev = events(
      (1L, 1000L, 1L, "a"), (1L, 2000L, 2L, "b"),
      (1L, 3000L, 3L, "a"), (1L, 4000L, 4L, "b"))
    val got = EventOps.transitionLift(ev, minCount = 2).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("a", "b")))
  }

  test("the event_id tie-break makes equal timestamps deterministic") {
    val ev = events(
      (1L, 1000L, 2L, "b"), (1L, 1000L, 1L, "a"), (1L, 2000L, 3L, "c"))
    // order by (ts, event_id): a -> b -> c
    val got = EventOps.transitionLift(ev, minCount = 1).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"), ("b", "c")))
  }
}
