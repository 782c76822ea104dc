package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure DoReMi reweighting kernel (the arithmetic
  * `Curation.mixDoremi` executes — DoremiSpec pins one case of THIS
  * mirror against the engine by hand, the SketchProperties discipline):
  * weights form a near-exact distribution, respond weakly-monotonically
  * to excess loss, never fall below the smoothing floor, and the two
  * degenerate knobs (zero excess, zero learning rate) are exact uniform
  * fixed points. All arithmetic trunc-toward-zero int64, same as both
  * engines. */
object MixProperties extends Properties("graft.mix.doremi") {

  private val M = 1000000L

  /** Mirror of mixDoremi: domains = (n_docs, ssum) pairs. */
  private def doremi(domains: Seq[(Long, Long)], etaPpm: Long,
      cPpm: Long, steps: Int): Seq[Long] = {
    val k = domains.size
    val means = domains.map { case (n, s) => s / n }
    val ref = domains.map(_._2).sum / domains.map(_._1).sum
    val ex = means.map(m => math.max(0L, ref - m))
    val emax = ex.max
    val exn = ex.map(e => if (emax == 0) 0L else e * M / emax)
    val u = M / k
    var w = Seq.fill(k)(u)
    var acc = Seq.fill(k)(0L)
    for (_ <- 1 to steps) {
      val wp = w.zip(exn).map { case (wi, e) => wi * (M + etaPpm * e / M) / M }
      val tw = wp.sum
      val wn = wp.map(_ * M / tw)
      w = wn.map(x => ((M - cPpm) * x + cPpm * u) / M)
      acc = acc.zip(w).map { case (a, x) => a + x }
    }
    acc.map(_ / steps)
  }

  private val genDomain: Gen[(Long, Long)] = for {
    n <- Gen.chooseNum(1L, 1000L)
    mean <- Gen.chooseNum(-1000000000L, 1000000000L)
  } yield (n, n * mean)
  private val genDomains: Gen[Seq[(Long, Long)]] =
    Gen.chooseNum(2, 20).flatMap(k => Gen.listOfN(k, genDomain))
  private val genEta = Gen.chooseNum(0L, 2000000L)
  private val genC = Gen.chooseNum(0L, 100000L)
  private val genSteps = Gen.chooseNum(1, 8)

  property("weights are a near-exact ppm distribution (floor losses bounded)") =
    forAll(genDomains, genEta, genC, genSteps) { (ds, eta, c, st) =>
      val ws = doremi(ds, eta, c, st)
      val s = ws.sum
      s <= M && s >= M - 4L * ds.size - 4L
    }

  property("weakly monotone in excess loss") =
    forAll(genDomains, genEta, genC, genSteps) { (ds, eta, c, st) =>
      val means = ds.map { case (n, s) => s / n }
      val ref = ds.map(_._2).sum / ds.map(_._1).sum
      val ex = means.map(m => math.max(0L, ref - m))
      val ws = doremi(ds, eta, c, st)
      ex.zip(ws).combinations(2).forall {
        case Seq((e1, w1), (e2, w2)) =>
          if (e1 > e2) w1 >= w2 else if (e2 > e1) w2 >= w1 else true
        case _ => true
      }
    }

  property("no weight falls below the smoothing floor") =
    forAll(genDomains, genEta, genC, genSteps) { (ds, eta, c, st) =>
      val u = M / ds.size
      doremi(ds, eta, c, st).forall(_ >= c * u / M - 1)
    }

  property("zero excess everywhere is the exact uniform fixed point") =
    forAll(Gen.chooseNum(2, 20), Gen.chooseNum(1L, 1000L),
        Gen.chooseNum(-1000000L, 1000000L), genEta, genC, genSteps) {
      (k, n, mean, eta, c, st) =>
        val ds = Seq.fill(k)((n, n * mean)) // identical domains: ref == mean
        doremi(ds, eta, c, st).forall(_ == M / k)
    }

  property("eta = 0 is the exact uniform fixed point regardless of excess") =
    forAll(genDomains, genC, genSteps) { (ds, c, st) =>
      doremi(ds, 0L, c, st).forall(_ == M / ds.size)
    }
}
