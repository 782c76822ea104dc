package graft.operators

import graft.SparkSpec

/** row_dupes: replays and multiplicities firing by hand, the NULL
  * separator semantics, non-finite identity, the clean/empty reads.
  * Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class RowDupesSpec extends SparkSpec {

  private def census(df: org.apache.spark.sql.DataFrame) = {
    val r = Extras.rowDupes(df).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("replays and multiplicities count exactly") {
    import spark.implicits._
    // ("a",1) x3, ("b",2) x2, ("c",3) x1
    val df = Seq(("a", 1L), ("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L), ("c", 3L))
      .toDF("k", "v")
    assert(census(df) == ((6L, 3L, 3L, 500000L, 3L)))
  }

  test("a clean frame and an empty frame both read zero dups") {
    import spark.implicits._
    assert(census(Seq(("a", 1L), ("b", 1L)).toDF("k", "v")) ==
      ((2L, 2L, 0L, 0L, 1L)))
    assert(census(Seq.empty[(String, Long)].toDF("k", "v")) ==
      ((0L, 0L, 0L, 0L, 0L)))
  }

  test("NULL position matters; equal NULL rows are still duplicates") {
    import spark.implicits._
    val df = Seq[(String, String)](("a", null), (null, "a"), (null, null),
      (null, null)).toDF("x", "y")
    assert(census(df) == ((4L, 3L, 1L, 250000L, 2L)),
      "(a, NULL) and (NULL, a) stay distinct; the two all-NULL rows collapse")
  }

  test("non-finite doubles keep their identity in the digest") {
    import spark.implicits._
    val df = Seq(Double.NaN, Double.NaN, Double.PositiveInfinity, 1.5)
      .toDF("v")
    assert(census(df) == ((4L, 3L, 1L, 250000L, 2L)),
      "two NaN rows are duplicates of each other, not of inf")
  }
}
