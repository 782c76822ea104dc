package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregation: keeps the k best (score DESC, id ASC) rows
  * per group inside the aggregation buffer itself.
  *
  * This is the scale-safe top-k-per-key shape: a single partial+final
  * aggregation — every map task reduces its slice to ≤ k entries before
  * anything shuffles, and each group's final buffer is ≤ k regardless of
  * input size. Compare the window form (`row_number().over(partitionBy
  * (key))` + filter), which shuffles EVERY scored row into one reducer
  * per key. Used by the ANN queries; the per-partition-pre-rank window
  * variant is kept in `Similarity.topKPerQuery` for the plan-comparison
  * narrative.
  *
  * Buffer is a sorted Vector capped at k (k is small — heap constants
  * don't pay off below ~100); merge is a bounded sorted merge. Ordering
  * (score DESC, id ASC) matches the deterministic oracle tie-break.
  */
class TopK(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] = {
    // NaN scores (e.g. cosine of a zero vector) are dropped outright: the
    // comparator is not total under NaN — one NaN parked at the buffer tail
    // would make `!better(v, buf.last)` true for EVERY candidate and
    // silently reject all later genuinely-better rows
    if (java.lang.Double.isNaN(v._1)) buf
    else if (buf.size == k && !better(v, buf.last)) buf
    else {
      val (pre, post) = buf.span(better(_, v))
      (pre :+ v) ++ post.take(k - pre.size - 1)
    }
  }

  override def zero: Seq[(Double, Long)] = Vector.empty
  override def reduce(buf: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, v)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
