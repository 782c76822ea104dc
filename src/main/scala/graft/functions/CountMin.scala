package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch over a stream of term hashes — the one-pass,
  * fixed-memory frequency summary (Cormode & Muthukrishnan 2005).
  *
  * This is the mergeable-sketch aggregation shape (the same family as
  * `approx_distinct`'s HLL and `bloom_membership`'s Bloom filter): every
  * map task folds its slice into a flat `DEPTH x WIDTH` long matrix,
  * partials merge by elementwise addition, and the final buffer is a
  * constant ~32 KB regardless of input size — nothing token-sized ever
  * shuffles. Because addition commutes, the sketch built from streaming
  * per-occurrence increments is bit-identical to one built from exact
  * per-term counts, which is what lets a plain-SQL oracle reproduce the
  * estimates exactly.
  *
  * Layout: buffer(d * WIDTH + bucket_d(h)) is row d's counter;
  * buffer(DEPTH * WIDTH) (the last slot) is the total increment count N.
  * bucket_d(h) = ((h * A(d) + B(d)) mod P) mod WIDTH — affine row hashes
  * over the portable polynomial term hash, P = [[Portable.P]]. Estimates
  * (min over rows) are computed SQL-side via `element_at`, so the lookup
  * stays inside codegen; this class only builds the sketch.
  */
class CountMin extends Aggregator[Long, Array[Long], Array[Long]] {
  import CountMin._

  override def zero: Array[Long] = new Array[Long](Depth * Width + 1)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var d = 0
    while (d < Depth) {
      buf(d * Width + bucket(d, h)) += 1L
      d += 1
    }
    buf(Depth * Width) += 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}

object CountMin {
  val Depth = 4
  val Width = 1024
  /** Affine row-hash constants — mirrored verbatim in the DuckDB oracle. */
  val A: Array[Long] = Array(131L, 137L, 139L, 149L)
  val B: Array[Long] = Array(7L, 11L, 13L, 17L)

  def bucket(d: Int, h: Long): Int =
    (((h * A(d) + B(d)) % Portable.P) % Width).toInt

  /** Point-estimate SQL fragment: min over rows of the addressed counter
    * in a sketch array column. 1-indexed for `element_at`. */
  def estimateSql(cmsCol: String, hCol: String): String =
    (0 until Depth).map { d =>
      s"element_at($cmsCol, CAST(${d * Width} + (($hCol * ${A(d)} + ${B(d)}) % ${Portable.P}) % $Width AS INT) + 1)"
    }.mkString("least(", ", ", ")")
}
