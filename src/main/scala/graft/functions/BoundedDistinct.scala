package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded exact-distinct count: keeps a sorted set of int64 fingerprints
  * capped at k + 1 inside the aggregation buffer — the mergeable
  * "exact up to k, overflow beyond" primitive behind table_profile's
  * distinct lane.
  *
  * Scale contract (the TopK discipline): every map task's buffer holds at
  * most k + 1 longs regardless of input size, merge is a bounded sorted
  * union that SHORT-CIRCUITS once either side has overflowed, and the
  * finish emits the exact count when the set stayed within k or -1 (the
  * overflow sentinel) when it passed it — the caller then reads the
  * parallel sketch estimate instead. Compare count(DISTINCT c), whose
  * dedup state is unbounded per group.
  *
  * Identity is the caller's 60-bit paired fingerprint, not the value:
  * within k <= ~10^6 the birthday term k²/2^61 is sub-ppb (the
  * corpus_diversity pairing argument), and anything beyond k is
  * sketch-estimated anyway.
  */
class BoundedDistinct(k: Int) extends Aggregator[Long, Seq[Long], Long] {
  require(k >= 1, s"k must be positive, got $k")

  private def insert(buf: Seq[Long], v: Long): Seq[Long] =
    if (buf.size > k) buf // overflowed: the sentinel state absorbs everything
    else {
      val i = {
        // binary search over the sorted buffer
        var lo = 0; var hi = buf.size
        while (lo < hi) { val m = (lo + hi) >>> 1; if (buf(m) < v) lo = m + 1 else hi = m }
        lo
      }
      if (i < buf.size && buf(i) == v) buf
      else (buf.take(i) :+ v) ++ buf.drop(i) // may reach k + 1: the overflow mark
    }

  override def zero: Seq[Long] = Vector.empty
  override def reduce(buf: Seq[Long], v: Long): Seq[Long] = insert(buf, v)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    if (a.size > k) a else if (b.size > k) b else b.foldLeft(a)(insert)
  override def finish(buf: Seq[Long]): Long =
    if (buf.size > k) -1L else buf.size.toLong
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
}
