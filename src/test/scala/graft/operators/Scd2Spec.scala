package graft.operators

import graft.SparkSpec

/** scd2_history: the type-2 collapse pinned by hand — consecutive equal
  * attribute values fold into one validity interval, nulls compare
  * null-safely, same-timestamp ties break on seq, and the open interval
  * is the current version. Cross-engine exactness is the DuckDB oracle's
  * job at sf0.01.
  */
class Scd2Spec extends SparkSpec {

  private def log(rs: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rs.toDF("key", "ts_us", "seq", "attr")
  }

  private def run(rs: (Long, Long, Long, String)*) =
    Extras.scd2History(log(rs: _*)).collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getString(4), r.getLong(5), r.getInt(6))
    }

  test("consecutive equal values collapse; intervals chain; last is current") {
    val got = run(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"),
      (1L, 30L, 3L, "B"), (1L, 40L, 4L, "A"))
    assert(got.toSeq == Seq(
      (1L, 1, 10L, 30L, "A", 2L, 0),
      (1L, 2, 30L, 40L, "B", 1L, 0),
      (1L, 3, 40L, -1L, "A", 1L, 1)))
  }

  test("null attributes collapse null-safely and can open a version") {
    val got = Extras.scd2History(log(
      (2L, 10L, 1L, null), (2L, 20L, 2L, null), (2L, 30L, 3L, "X")))
      .collect().map(r => (r.getInt(1), Option(r.getString(4)), r.getLong(5)))
    assert(got.toSeq == Seq((1, None, 2L), (2, Some("X"), 1L)))
  }

  test("same-timestamp versions order by seq") {
    val got = run((3L, 10L, 2L, "B"), (3L, 10L, 1L, "A"))
    assert(got.map(_._5).toSeq == Seq("A", "B"),
      "seq must break the tie: A (seq 1) is version 1")
    assert(got(0)._4 == 10L, "A's interval closes at B's valid_from")
  }

  test("a never-changing key is one current version counting every raw row") {
    val got = run((4L, 10L, 1L, "Z"), (4L, 20L, 2L, "Z"), (4L, 30L, 3L, "Z"))
    assert(got.toSeq == Seq((4L, 1, 10L, -1L, "Z", 3L, 1)))
  }
}
