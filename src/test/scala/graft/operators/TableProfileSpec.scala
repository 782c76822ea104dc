package graft.operators

import graft.SparkSpec

/** table_profile: the per-column card pinned by hand on a mixed-type
  * frame, the exact-or-sketch distinct lane on both sides of exactK, the
  * BoundedDistinct buffer semantics, canonicalization edges and loud
  * guards. Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class TableProfileSpec extends SparkSpec {

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getInt(6), r.getString(7), r.getString(8)))).toMap

  test("the card replays by hand on a mixed-type frame with nulls") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "b", 2.5), (2L, null, -1.5), (3L, "a", 2.5), (null, "a", null))
      .toDF("id", "name", "score")
    val got = rowsOf(Extras.tableProfile(df))
    assert(got("id") == (("bigint", 4L, 1L, 250000L, 3L, 1, "1", "3")))
    assert(got("name") == (("string", 4L, 1L, 250000L, 2L, 1, "a", "b")))
    // doubles canon as floor-micro units: 2.5 -> 2500000, -1.5 -> -1500000
    assert(got("score") == (("double", 4L, 1L, 250000L, 2L, 1,
      "-1500000", "2500000")))
  }

  test("the distinct lane switches from exact to sketch at exactK") {
    import spark.implicits._
    val df = (1L to 3000L).map(i => (i, i % 7)).toDF("wide", "narrow")
    val got = rowsOf(Extras.tableProfile(df, exactK = 100))
    val (_, _, _, _, estW, exW, _, _) = got("wide")
    val (_, _, _, _, estN, exN, _, _) = got("narrow")
    assert(exN == 1 && estN == 7L, "low cardinality answers exactly")
    assert(exW == 0, "3000 distinct passes exactK = 100: sketch lane")
    assert(math.abs(estW - 3000L) < 600L,
      s"sketch estimate $estW must land near 3000 (m = 256, ~6.5% band)")
    // and with a roomy bound the same column answers exactly
    val roomy = rowsOf(Extras.tableProfile(df, exactK = 4000))
    assert(roomy("wide")._6 == 1 && roomy("wide")._5 == 3000L)
  }

  test("BoundedDistinct buffers are bounded, deduped and overflow-sticky") {
    val bd = new graft.functions.BoundedDistinct(3)
    val b = Seq(5L, 1L, 5L, 3L).foldLeft(bd.zero)(bd.reduce)
    assert(b == Seq(1L, 3L, 5L) && bd.finish(b) == 3L, "sorted, deduped, exact")
    val over = bd.reduce(b, 9L)
    assert(over.size == 4 && bd.finish(over) == -1L, "k + 1 marks overflow")
    assert(bd.reduce(over, 100L).size == 4, "overflowed buffers absorb without growth")
    assert(bd.finish(bd.merge(over, bd.zero)) == -1L, "overflow survives merge")
    assert(bd.finish(bd.merge(Seq(1L, 2L), Seq(2L, 3L))) == 3L, "merge dedupes")
    intercept[IllegalArgumentException](new graft.functions.BoundedDistinct(0))
  }

  test("an all-null column reads zero distinct, exact, null min/max") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)]((1L, null), (2L, null))
      .toDF("id", "empty")
    val r = Extras.tableProfile(df).collect().find(_.getString(0) == "empty").get
    assert(r.getLong(3) == 2L && r.getLong(4) == 1000000L)
    assert(r.getLong(5) == 0L && r.getInt(6) == 1)
    assert(r.isNullAt(7) && r.isNullAt(8))
  }

  test("NaN and infinities profile as sentinel identities, never ANSI cast crashes") {
    import spark.implicits._
    val df = Seq(1.5, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NaN, 2.5).toDF("v")
    val r = Extras.tableProfile(df).collect()(0)
    // distinct identities: 1500000, 2500000, 'nan', 'inf', '-inf' -> 5
    assert(r.getLong(5) == 5L && r.getInt(6) == 1)
    // min/max live in the FINITE int lane only
    assert(r.getString(7) == "1500000" && r.getString(8) == "2500000")
    assert(r.getLong(3) == 0L, "non-finite values are not nulls")
  }

  test("unprofileable types and bad knobs are loud") {
    import spark.implicits._
    val arr = Seq((1L, Seq(1, 2))).toDF("id", "xs")
    intercept[IllegalArgumentException](Extras.tableProfile(arr))
    intercept[IllegalArgumentException](
      Extras.tableProfile(arr.select("id"), exactK = 0))
  }
}
