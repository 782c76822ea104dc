package graft.operators

import graft.SparkSpec

/** map_eval: average precision and reciprocal rank pinned by hand —
  * perfect ranking, the classic interleaved case, the judged-pool R
  * convention, no-relevant guard and loud guards. Cross-engine exactness
  * is the DuckDB oracle's job at sf0.01.
  */
class MapEvalSpec extends SparkSpec {

  private def frame(rows: (String, Int, Long)*) = {
    import spark.implicits._
    rows.toDF("qid", "rank", "rel")
  }

  private def ap(k: Int, rows: (String, Int, Long)*): Map[String, (Long, Long, Long, Long)] =
    Retrieval.avgPrecisionAt(frame(rows: _*), k).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("all-relevant rankings read AP = RR = 1 exactly") {
    val got = ap(10, ("q", 1, 1L), ("q", 2, 1L), ("q", 3, 1L))
    assert(got("q") == ((3L, 3L, 1000000L, 1000000L)))
  }

  test("the classic interleaved case replays by hand") {
    // rel at ranks 1, 3, 5: P@1=1, P@3=2/3, P@5=3/5
    // AP = (1000000 + 666666 + 600000) / 3 = 755555; RR = 1e6
    val got = ap(10, ("q", 1, 1L), ("q", 2, 0L), ("q", 3, 1L),
      ("q", 4, 0L), ("q", 5, 1L))
    assert(got("q") == ((5L, 3L, 755555L, 1000000L)))
  }

  test("a late first hit discounts RR; R is the judged-pool count") {
    // only rank 4 relevant: AP = P@4 = 250000, RR = 1e6 div 4
    val got = ap(10, ("q", 1, 0L), ("q", 2, 0L), ("q", 3, 0L), ("q", 4, 1L))
    assert(got("q") == ((4L, 1L, 250000L, 250000L)))
  }

  test("no relevant docs reads the guard; k truncates the judged window") {
    assert(ap(10, ("q", 1, 0L), ("q", 2, 0L))("q") == ((2L, 0L, 0L, 0L)))
    // the only hit sits at rank 3, outside k = 2
    assert(ap(2, ("q", 1, 0L), ("q", 2, 0L), ("q", 3, 1L))("q") ==
      ((2L, 0L, 0L, 0L)))
  }

  test("queries stay independent; graded rel binarizes at rel > 0") {
    val got = ap(10, ("q1", 1, 3L), ("q1", 2, 0L), ("q2", 1, 0L), ("q2", 2, 2L))
    assert(got("q1") == ((2L, 1L, 1000000L, 1000000L)))
    assert(got("q2") == ((2L, 1L, 500000L, 500000L)))
  }

  test("guards are loud") {
    intercept[IllegalArgumentException](Retrieval.avgPrecisionAt(frame(("q", 1, 1L)), 0))
    intercept[IllegalArgumentException](
      Retrieval.avgPrecisionAt(frame(("q", 1, 1L)).select("qid", "rank"), 5))
  }
}
