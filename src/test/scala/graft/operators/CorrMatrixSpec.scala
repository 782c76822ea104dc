package graft.operators

import graft.SparkSpec

/** corr_matrix: the Pearson arithmetic replayed in plain Scala, the ±1
  * extremes, the zero-variance guard, pair naming/count and loud guards.
  * Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class CorrMatrixSpec extends SparkSpec {

  private def df2(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("x", "y")
  }

  /** Independent double-precision Pearson over exact integer sums —
    * the same combination ORDER as the operator so equality is exact. */
  private def pearson(xs: Seq[Long], ys: Seq[Long]): Double = {
    val n = xs.size.toDouble
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val pxx = xs.map(v => v * v).sum.toDouble
    val pyy = ys.map(v => v * v).sum.toDouble
    val pxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
    val (dx, dy) = (n * pxx - sx * sx, n * pyy - sy * sy)
    if (n <= 1 || dx <= 0 || dy <= 0) 0.0
    else (n * pxy - sx * sy) / math.sqrt(dx) / math.sqrt(dy)
  }

  test("the correlation replays the plain-Scala formula bit-for-bit") {
    val xs = Seq(3L, 7L, 1L, 9L, 4L, 6L)
    val ys = Seq(10L, 2L, 8L, 5L, 5L, 1L)
    val got = Extras.corrMatrix(df2(xs.zip(ys): _*)).collect()
    assert(got.length == 1)
    assert((got(0).getString(0), got(0).getLong(1)) == (("x~y", 6L)))
    assert(got(0).getDouble(2) == pearson(xs, ys), "identical double combination order")
  }

  test("perfect linear relations hit the ±1 extremes") {
    val xs = Seq(1L, 2L, 3L, 4L)
    val up = Extras.corrMatrix(df2(xs.map(v => (v, 2 * v + 5)): _*))
      .collect()(0).getDouble(2)
    assert(math.abs(up - 1.0) < 1e-12, s"got $up")
    val dn = Extras.corrMatrix(df2(xs.map(v => (v, 100 - 3 * v)): _*))
      .collect()(0).getDouble(2)
    assert(math.abs(dn + 1.0) < 1e-12, s"got $dn")
  }

  test("zero variance and single rows read 0.0 by guard, never NaN") {
    val c = Extras.corrMatrix(df2((5L, 1L), (5L, 2L), (5L, 3L))).collect()(0)
    assert(c.getDouble(2) == 0.0, "constant x: guard, not 0/0")
    val one = Extras.corrMatrix(df2((5L, 1L))).collect()(0)
    assert(one.getDouble(2) == 0.0 && one.getLong(1) == 1L)
  }

  test("k columns yield k(k-1)/2 pairs named in column order") {
    import spark.implicits._
    val d = Seq((1L, 2L, 3L, 4L), (2L, 4L, 5L, 9L), (3L, 5L, 7L, 2L))
      .toDF("a", "b", "c", "d")
    val got = Extras.corrMatrix(d).collect().map(_.getString(0)).toSeq
    assert(got == Seq("a~b", "a~c", "a~d", "b~c", "b~d", "c~d"))
  }

  test("guards are loud") {
    import spark.implicits._
    intercept[IllegalArgumentException](
      Extras.corrMatrix(Seq(1L).toDF("only")))
  }
}
