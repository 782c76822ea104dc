package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure kernels behind the seventh-continuation
  * operators: the HDR bucket geometry (monotone, one-sided, identity
  * floor), the dyadic geometric decode (range, parity symmetry, segment
  * boundaries), the Benford TVD (duplication invariance, mass bounds),
  * the Mann–Whitney midrank closed form (range, reversal complement,
  * tie chance) and the BoundedDistinct buffer (exact-or-overflow, merge
  * = refold). Each law mirrors the SQL/Aggregator the operators execute;
  * the engine side is pinned by the oracle at sf0.01 and the hand cases
  * in the per-operator specs.
  */
object SketchProperties extends Properties("graft.sketch") {

  // ---- HDR bucket geometry (mirror of hdrBucketExpr/hdrRepExpr, b = 5)
  private val B = 5
  private val Base = 1L << B
  private def bucket(x: Long): Long =
    if (x < Base) x
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      (e - B).toLong * Base + (x >> (e - B))
    }
  private def rep(id: Long): Long =
    if (id < Base) id else ((id % Base) + Base) << ((id / Base) - 1)

  private val posLong: Gen[Long] = Gen.chooseNum(0L, (1L << 62) - 1)

  property("hdr: rep is a one-sided lower bound within 2^-b") =
    forAll(posLong) { x =>
      val r = rep(bucket(x))
      r <= x && ((x - r) << B) < r + Base
    }

  property("hdr: bucket is monotone and rep lands in its own bucket") =
    forAll(posLong, posLong) { (a, b) =>
      val mono = if (a <= b) bucket(a) <= bucket(b) else bucket(b) <= bucket(a)
      mono && bucket(rep(bucket(a))) == bucket(a)
    }

  property("hdr: exact identity below 2^b") =
    forAll(Gen.chooseNum(0L, Base - 1)) { x => bucket(x) == x && rep(x) == x }

  // ---- dyadic geometric decode (mirror of geometricNoiseExpr) ----------
  private val M = 3L * (1L << 30) - 2L
  private def decode(u: Long): Long =
    if (u < 1073741824L) 0L
    else {
      val w = u - 1073741824L
      val sign = 1L - 2L * (w % 2L)
      sign * (31L - java.lang.Long.toBinaryString(1073741823L - w / 2L).length)
    }

  private val uni: Gen[Long] = Gen.chooseNum(0L, M - 1)

  property("geometric: every uniform decodes into [-30, 30]") =
    forAll(uni) { u => val z = decode(u); z >= -30L && z <= 30L }

  property("geometric: paired parity flips only the sign") =
    forAll(Gen.chooseNum(0L, (1L << 30) - 2L)) { v =>
      decode(1073741824L + 2 * v) == -decode(1073741824L + 2 * v + 1)
    }

  property("geometric: magnitude-z segments have exactly 2^(30-z) units per sign") =
    forAll(Gen.chooseNum(1, 30)) { z =>
      val first = 1073741824L + 2L * ((1L << 30) - (1L << (31 - z)))
      val last = first + 2L * ((1L << (30 - z)) - 1L)
      decode(first) == z.toLong && decode(last) == z.toLong &&
        (z == 30 || decode(last + 2L) == (z + 1).toLong)
    }

  // ---- Benford TVD (mirror of benfordReadout's integer arithmetic) -----
  private def tvd(xs: Seq[Long]): Long = {
    val pos = xs.filter(_ > 0)
    if (pos.isEmpty) 0L
    else {
      val n = pos.size.toLong
      val byD = pos.groupBy(_.toString.head.asDigit).view.mapValues(_.size.toLong)
      CorpusOps.benfordExpPpm.map { case (d, e) =>
        math.abs(byD.getOrElse(d, 0L) * 1000000L / n - e)
      }.sum / 2
    }
  }

  private val valList: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(1L, 1000000L))

  property("benford: TVD is per-mille-of-mass bounded and duplication-invariant") =
    forAll(valList, Gen.chooseNum(2, 5)) { (xs, k) =>
      val t = tvd(xs)
      t >= 0L && t <= 1000000L && tvd(Seq.fill(k)(xs).flatten) == t
    }

  // ---- Mann–Whitney midrank closed form (mirror of classifierAuc) ------
  private def auc(rows: Seq[(Long, Int)]): Long = {
    val np = rows.count(_._2 == 1).toLong
    val nn = rows.size - np
    if (np == 0 || nn == 0) 0L
    else {
      val groups = rows.groupBy(_._1).toSeq.sortBy(_._1)
      var cp = 0L
      var s2 = BigInt(0)
      groups.foreach { case (_, g) =>
        val pos = g.count(_._2 == 1).toLong
        s2 += BigInt(pos) * (2 * cp + g.size + 1)
        cp += g.size
      }
      ((s2 - BigInt(np) * (np + 1)) * 1000000 / (2 * BigInt(np) * nn)).toLong
    }
  }

  private val scored: Gen[List[(Long, Int)]] = Gen.nonEmptyListOf(
    Gen.zip(Gen.chooseNum(0L, 20L), Gen.oneOf(0, 1)))

  property("auc: in range, and reversing the scores complements it (within trunc)") =
    forAll(scored) { rows =>
      val a = auc(rows)
      val r = auc(rows.map { case (s, y) => (-s, y) })
      val bothClasses = rows.exists(_._2 == 1) && rows.exists(_._2 == 0)
      a >= 0L && a <= 1000000L &&
        (!bothClasses || math.abs(a + r - 1000000L) <= 1L)
    }

  property("auc: one shared score carries no information (exactly 1/2)") =
    forAll(Gen.chooseNum(1, 20), Gen.chooseNum(1, 20)) { (p, n) =>
      auc(Seq.fill(p)((7L, 1)) ++ Seq.fill(n)((7L, 0))) == 500000L
    }

  // ---- BoundedDistinct: exact-or-overflow, merge = refold ---------------
  private val fps: Gen[List[Long]] = Gen.listOf(Gen.chooseNum(-50L, 50L))

  property("boundedDistinct: finish is the exact count or the overflow sentinel") =
    forAll(fps, Gen.chooseNum(1, 20)) { (xs, k) =>
      val bd = new graft.functions.BoundedDistinct(k)
      val got = bd.finish(xs.foldLeft(bd.zero)(bd.reduce))
      val d = xs.distinct.size.toLong
      if (d <= k) got == d else got == -1L
    }

  property("boundedDistinct: merging two folds equals folding the concatenation") =
    forAll(fps, fps, Gen.chooseNum(1, 12)) { (a, b, k) =>
      val bd = new graft.functions.BoundedDistinct(k)
      val m = bd.merge(a.foldLeft(bd.zero)(bd.reduce), b.foldLeft(bd.zero)(bd.reduce))
      bd.finish(m) == bd.finish((a ++ b).foldLeft(bd.zero)(bd.reduce))
    }
}
