package graft.operators

import graft.SparkSpec

/** mad_outliers: the median/MAD profile replayed by hand, the
  * breakdown-point contrast that justifies robust stats, the MAD = 0
  * degenerate case, the kMilli knob and loud guards. Cross-engine
  * exactness is the DuckDB oracle's job at sf0.01.
  */
class MadOutliersSpec extends SparkSpec {

  private def frame(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("g", "x")
  }

  private def row(df: org.apache.spark.sql.DataFrame, g: String) =
    df.collect().find(_.getString(0) == g).map(r =>
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).get

  test("the profile replays by hand") {
    // values 1..9 and 100: type-1 median = 5th smallest = 5;
    // adevs sorted 0,1,1,2,2,3,3,4,4,95 -> mad = 2; at kMilli = 5000
    // only adev > 10 flags -> exactly the 100
    val vals = ((1L to 9L) :+ 100L).map(("a", _))
    val got = row(CorpusOps.madOutliers(frame(vals: _*), "x"), "a")
    assert(got == ((10L, 5L, 2L, 1L, 100000L)))
  }

  test("breakdown point: a monster outlier cannot drag its own yardstick") {
    // same body, outlier 100 vs 1e12: a mean/stddev screen would let the
    // monster inflate sigma and unflag itself; med and MAD are identical
    val a = ((1L to 9L) :+ 100L).map(("a", _))
    val b = ((1L to 9L) :+ 1000000000000L).map(("b", _))
    val df = CorpusOps.madOutliers(frame(a ++ b: _*), "x")
    val (na, medA, madA, oA, _) = row(df, "a")
    val (nb, medB, madB, oB, _) = row(df, "b")
    assert((medA, madA) == ((medB, madB)), "median and MAD ignore the magnitude")
    assert(na == nb && oA == 1L && oB == 1L)
  }

  test("MAD = 0 flags every deviant (the degenerate read, kept deliberately)") {
    val vals = Seq(("a", 5L), ("a", 5L), ("a", 5L), ("a", 5L), ("a", 9L))
    val got = row(CorpusOps.madOutliers(frame(vals: _*), "x"), "a")
    assert(got == ((5L, 5L, 0L, 1L, 200000L)))
  }

  test("kMilli is the gate knob; guards are loud") {
    val vals = ((1L to 9L) :+ 100L).map(("a", _))
    // the 100's adev is 95 = 47.5 MAD: kMilli 47500 still flags (strict >
    // needs 95*1000 > 47500*2 = 95000 -> false), 47499 flags
    val at = (k: Long) => row(
      CorpusOps.madOutliers(frame(vals: _*), "x", kMilli = k), "a")._4
    assert(at(47499L) == 1L && at(47500L) == 0L,
      "the comparison is strict and exact at the boundary")
    intercept[IllegalArgumentException](
      CorpusOps.madOutliers(frame(("a", 1L)), "x", kMilli = 0L))
    intercept[IllegalArgumentException](CorpusOps.madOutliers(frame(("a", 1L)), "nope"))
    intercept[IllegalArgumentException](
      CorpusOps.madOutliers(frame(("a", 1L)).select("x"), "x"))
  }

  test("pseudorandom data matches a plain-Scala replay") {
    val xs = (1 to 501).map(i => (i.toLong * i * 7919L) % 100000L)
    val got = row(CorpusOps.madOutliers(frame(xs.map(("a", _)): _*), "x"), "a")
    def q500(s: Seq[Long]): Long = s.sorted.apply(((s.size + 1) / 2) - 1)
    val med = q500(xs)
    val adev = xs.map(x => math.abs(x - med))
    val mad = q500(adev)
    val o = adev.count(a => a * 1000L > 5000L * mad).toLong
    assert(got == ((501L, med, mad, o, o * 1000000L / 501L)))
  }
}
