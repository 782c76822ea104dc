package graft.operators

import graft.SparkSpec

/** ab_test_chi2: the staged-integer 2x2 chi-square pinned by hand against
  * the textbook formula, plus every zero-margin guard. Cross-engine
  * exactness is the DuckDB oracle's job at sf0.01.
  */
class AbTestSpec extends SparkSpec {

  private def units(rows: (Int, Int)*) = {
    import spark.implicits._
    rows.toDF("variant", "converted")
  }

  /** chi2·1000 replayed via BigInt with the operator's exact staging. */
  private def chi2Milli(na: Long, ca: Long, nb: Long, cb: Long): Long = {
    val d = BigInt(ca) * (nb - cb) - BigInt(cb) * (na - ca)
    val inner = d * d / (BigInt(na) * nb)
    (inner * 1000 * (na + nb) / (BigInt(ca + cb) * (na - ca + nb - cb))).toLong
  }

  test("counts, rates, lift and chi2 replay the hand table") {
    // A: 30 of 100 convert; B: 45 of 100
    val rows = Seq.fill(30)((0, 1)) ++ Seq.fill(70)((0, 0)) ++
      Seq.fill(45)((1, 1)) ++ Seq.fill(55)((1, 0))
    val r = EventOps.abTestChi2(units(rows: _*)).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((100L, 30L, 100L, 45L)))
    assert((r.getLong(4), r.getLong(5), r.getLong(6)) == ((300L, 450L, 150L)))
    val want = chi2Milli(100, 30, 100, 45)
    assert(r.getLong(7) == want, s"chi2_milli ${r.getLong(7)} != staged model $want")
    // textbook chi2 here = 200*(30*55-45*70)^2/(100*100*75*125) = 4.8
    assert(r.getLong(7) >= 4000L && r.getLong(7) <= 4900L)
    assert(r.getInt(8) == 1, "4.8 > 3.841: significant")
  }

  test("a null effect is insignificant; a negative lift is signed") {
    val rows = Seq.fill(50)((0, 1)) ++ Seq.fill(50)((0, 0)) ++
      Seq.fill(48)((1, 1)) ++ Seq.fill(52)((1, 0))
    val r = EventOps.abTestChi2(units(rows: _*)).collect()(0)
    assert(r.getLong(6) == -20L, "B converts 20pm worse")
    assert(r.getLong(7) == chi2Milli(100, 50, 100, 48))
    assert(r.getInt(8) == 0, "a 2-point gap at n=100 is noise")
  }

  test("zero margins are guarded, not division errors") {
    // all converted -> nonconverted margin 0
    val all = EventOps.abTestChi2(units(Seq.fill(5)((0, 1)) ++ Seq.fill(5)((1, 1)): _*))
      .collect()(0)
    assert(all.getLong(7) == 0L && all.getInt(8) == 0)
    // one arm empty
    val oneArm = EventOps.abTestChi2(units((0, 1), (0, 0))).collect()(0)
    assert(oneArm.getLong(2) == 0L && oneArm.getLong(7) == 0L)
    assert(oneArm.getLong(6) == -500L, "lift is computed from the guarded rates")
    // none converted
    val none = EventOps.abTestChi2(units((0, 0), (1, 0))).collect()(0)
    assert(none.getLong(7) == 0L)
  }

  test("critMilli is the significance knob, not a hardcoded constant") {
    val rows = Seq.fill(40)((0, 1)) ++ Seq.fill(40)((1, 0))
    val strict = EventOps.abTestChi2(units(rows: _*), critMilli = 100000L).collect()(0)
    assert(strict.getLong(7) == 80000L && strict.getInt(8) == 0,
      "chi2 = 80 is insignificant under a 100.0 critical value")
    intercept[IllegalArgumentException](
      EventOps.abTestChi2(units(rows: _*), critMilli = -1L))
  }

  test("a perfect separation maxes the statistic near N") {
    val rows = Seq.fill(40)((0, 1)) ++ Seq.fill(40)((1, 0))
    val r = EventOps.abTestChi2(units(rows: _*)).collect()(0)
    // exact chi2 = N = 80 -> 80000 milli
    assert(r.getLong(7) == 80000L)
    assert(r.getInt(8) == 1)
  }
}
