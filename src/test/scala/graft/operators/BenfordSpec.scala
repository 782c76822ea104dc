package graft.operators

import graft.SparkSpec

/** benford_screen: the ppm constants pinned against the mathematical law,
  * a log-uniform sample PASSING and a uniform sample FAILING the screen,
  * the absent-digit mass accounting, domain exclusions and loud guards.
  * Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class BenfordSpec extends SparkSpec {

  private def frame(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("g", "x")
  }

  /** Plain-Scala replay of the screen's integer TVD. */
  private def replayTvd(xs: Seq[Long]): Long = {
    val pos = xs.filter(_ > 0)
    val n = pos.size.toLong
    val byDigit = pos.groupBy(_.toString.head.asDigit).view.mapValues(_.size.toLong)
    CorpusOps.benfordExpPpm.map { case (d, exp) =>
      math.abs(byDigit.getOrElse(d, 0L) * 1000000L / n - exp)
    }.sum / 2
  }

  test("the ppm constants ARE Benford's law: within 1 ppm, summing to exactly 1e6") {
    CorpusOps.benfordExpPpm.foreach { case (d, ppm) =>
      val exact = math.log10(1.0 + 1.0 / d) * 1e6
      assert(math.abs(ppm - exact) <= 1.0, s"digit $d: $ppm vs $exact")
    }
    assert(CorpusOps.benfordExpPpm.map(_._2).sum == 1000000L,
      "largest-remainder rounding must preserve total mass")
  }

  test("a log-uniform sample passes; a uniform sample fails") {
    // floor(10^u) with u on a uniform grid IS the Benford-generating
    // process (scale invariance); float pow is fine in TEST code
    val logUniform = (0 until 3000).map(i =>
      ("a", math.pow(10.0, 3.0 + 6.0 * i / 3000.0).toLong))
    val uniform = (0 until 9000).map(i => ("b", 1000L + i))
    val got = CorpusOps.benfordScreen(frame(logUniform ++ uniform: _*), "x")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getInt(3)))
      .toMap
    val (nA, tvdA, flagA) = got("a")
    val (nB, tvdB, flagB) = got("b")
    assert(nA == 3000L && flagA == 0 && tvdA < 20000L,
      s"log-uniform must read Benford-clean, tvd=$tvdA")
    assert(nB == 9000L && flagB == 1 && tvdB > 200000L,
      s"uniform must fail loudly, tvd=$tvdB")
    assert(tvdA == replayTvd(logUniform.map(_._2)))
    assert(tvdB == replayTvd(uniform.map(_._2)))
  }

  test("absent digits still contribute their expected mass") {
    // every value starts with 1: obs = {1 -> 1e6}; tvd = 1e6 - 301030
    val got = CorpusOps.benfordScreen(frame((10L to 19L).map(("a", _)): _*), "x")
      .collect()(0)
    assert(got.getLong(1) == 10L && got.getLong(2) == (1000000L - 301030L)
      && got.getInt(3) == 1)
  }

  test("zero and negative values are outside Benford's domain") {
    val got = CorpusOps.benfordScreen(
      frame(("a", 0L), ("a", -123L), ("a", 17L), ("a", 29L)), "x").collect()(0)
    assert(got.getLong(1) == 2L, "n reports only what was screened")
  }

  test("the flag knob and guards are loud") {
    val f = frame(("a", 17L))
    // at flagTvdPpm = 1e6 nothing can flag (tvd <= 1e6 - min exp share)
    assert(CorpusOps.benfordScreen(f, "x", flagTvdPpm = 1000000L)
      .collect()(0).getInt(3) == 0)
    intercept[IllegalArgumentException](CorpusOps.benfordScreen(f, "x", flagTvdPpm = 0L))
    intercept[IllegalArgumentException](CorpusOps.benfordScreen(f, "nope"))
    intercept[IllegalArgumentException](CorpusOps.benfordScreen(f.select("x"), "x"))
  }
}
