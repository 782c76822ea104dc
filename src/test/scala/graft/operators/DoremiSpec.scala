package graft.operators

import graft.SparkSpec

/** Pins mixDoremi's arithmetic: one reweighting step verified against a
  * full hand computation (every floor stage worked by hand below), plus
  * the invariants a mix plan must satisfy — weights sum to ~1e6, the
  * highest-excess domain upweights, a zero-excess corpus stays uniform,
  * and the step loop composes (step-2 weights differ from step-1). */
class DoremiSpec extends SparkSpec {
  import spark.implicits._

  // doc-level scored frame: domain a mean 150 (docs 100, 200), b mean 0,
  // c mean 600 (3 docs of 600). ref = 2100 div 6 = 350; excess a=200,
  // b=350 (hardest), c=0; ex_n = a 571428, b 1000000, c 0; u = 333333.
  private def scored = Seq(
    ("a", 100L), ("a", 200L), ("b", 0L),
    ("c", 600L), ("c", 600L), ("c", 600L)
  ).toDF("source", "score_ppb")

  test("one reweighting step matches the hand computation exactly") {
    val out = Curation.mixDoremi(scored, steps = 1).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("mean_score_ppb"),
          r.getAs[Long]("excess_ppb"), r.getAs[Long]("weight_ppm"))).toMap
    // by hand (eta_ppm 500000, smooth_ppm 1000, all divisions floor):
    //   mult  = 1e6 + (500000*ex_n) div 1e6 -> a 1285714, b 1500000, c 1e6
    //   wp    = 333333*mult div 1e6         -> a 428570, b 499999, c 333333
    //   tw    = 1261902
    //   wn    = wp*1e6 div tw               -> a 339622, b 396226, c 264151
    //   w     = (999000*wn + 1000*333333) div 1e6
    //                                       -> a 339615, b 396163, c 264220
    assert(out("a") == ((2L, 150L, 200L, 339615L)))
    assert(out("b") == ((1L, 0L, 350L, 396163L)))
    assert(out("c") == ((3L, 600L, 0L, 264220L)))
  }

  test("weights sum to ~1e6 and order by excess loss; steps compose") {
    val one = Curation.mixDoremi(scored, steps = 1).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("weight_ppm")).toMap
    val four = Curation.mixDoremi(scored, steps = 4).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("weight_ppm")).toMap
    for (m <- Seq(one, four)) {
      val s = m.values.sum
      assert(s >= 999990L && s <= 1000000L, s"weights must sum to ~1e6, got $s")
      assert(m("b") > m("a") && m("a") > m("c"),
        "higher excess loss must mean higher weight")
    }
    // averaging over 4 sharpening iterates moves b further from uniform
    assert(four("b") > one("b"), "later steps keep upweighting the hard domain")
  }

  test("zero excess everywhere stays uniform at u = 1e6 div k") {
    val flat = Seq(("x", 10L), ("y", 10L), ("z", 10L)).toDF("source", "score_ppb")
    val out = Curation.mixDoremi(flat, steps = 3).collect()
      .map(_.getAs[Long]("weight_ppm")).toSeq
    // ex_n = 0 -> every multiplier is 1e6; wn = u exactly (equal wp), and
    // smoothing toward u is a fixed point
    assert(out == Seq(333333L, 333333L, 333333L))
  }
}
