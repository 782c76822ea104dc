package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Laws of the Count-Min sketch kernel — the invariants the
  * `cms_heavy_hitters` oracle contract rests on: the sketch never
  * undercounts, is order/partition-insensitive (so partial+final merge,
  * and the oracle's rebuild-from-exact-counts, are both sound), and
  * tracks the exact total in its N slot. */
object CountMinProperties extends Properties("graft.countmin") {

  private val hashes: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, Portable.P - 1))

  private def build(hs: Seq[Long]): Array[Long] = {
    val agg = new CountMin()
    hs.foldLeft(agg.zero)(agg.reduce)
  }

  private def estimate(buf: Array[Long], h: Long): Long =
    (0 until CountMin.Depth)
      .map(d => buf(d * CountMin.Width + CountMin.bucket(d, h)))
      .min

  property("never undercounts: estimate >= exact count") = forAll(hashes) { hs =>
    val buf = build(hs)
    hs.groupBy(identity).forall { case (h, occ) => estimate(buf, h) >= occ.size }
  }

  property("N slot is the exact total increment count") = forAll(hashes) { hs =>
    build(hs)(CountMin.Depth * CountMin.Width) == hs.size
  }

  property("split-merge == whole build (partial+final soundness)") =
    forAll(hashes, hashes) { (a, b) =>
      val agg = new CountMin()
      val merged = agg.merge(build(a), build(b))
      merged.toSeq == build(a ++ b).toSeq
    }

  property("weighted rebuild from exact counts == streaming build") =
    forAll(hashes) { hs =>
      // the oracle's construction: bucket sums from grouped exact counts
      val agg = new CountMin()
      val fromCounts = agg.zero
      hs.groupBy(identity).foreach { case (h, occ) =>
        var d = 0
        while (d < CountMin.Depth) {
          fromCounts(d * CountMin.Width + CountMin.bucket(d, h)) += occ.size.toLong
          d += 1
        }
        fromCounts(CountMin.Depth * CountMin.Width) += occ.size.toLong
      }
      fromCounts.toSeq == build(hs).toSeq
    }
}
