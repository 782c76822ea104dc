package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming quantiles: histogram state across live micro-batches, pinned
  * bit-identical to a batch build over the concatenated values, bounded by
  * the bucket domain, restart-recoverable, and loud on the shared knob
  * contract. */
class StreamingQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq(500, 900, 990)

  /** The batch twin: same bucket geometry + readout over a static frame. */
  private def batchQuantiles(xs: Seq[Long], b: Int): Seq[(Int, Long)] = {
    val hist = xs.toDF("x")
      .selectExpr(s"${graft.operators.CorpusOps.hdrBucketExpr("x", b)} AS bkt")
      .groupBy(col("bkt")).agg(count(lit(1)).as("cnt"))
    graft.operators.CorpusOps.hdrQuantiles(hist, Seq.empty, b, qs)
      .orderBy(col("q_pm")).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toSeq
  }

  private def drive(dir: String,
      batches: Seq[Seq[Long]]): Seq[StreamingQuantiles.Readout] = {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Long]
    val buf = scala.collection.mutable.Buffer[StreamingQuantiles.Readout]()
    val q = StreamingQuantiles.run(ms.toDF().toDF("x"), dir, 5, qs, buf.append(_))
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    buf.toSeq
  }

  test("the streaming readout is bit-identical to the batch build") {
    val b1 = (1 to 700).map(i => (i.toLong * 7919L) % 500000L)
    val b2 = (1 to 300).map(i => (i.toLong * 104729L) % 2000000L)
    val got = drive(tmpDir("squant1"), Seq(b1, b2))
    assert(got.head.quantiles == batchQuantiles(b1, 5) && got.head.n == 700L)
    assert(got.last.quantiles == batchQuantiles(b1 ++ b2, 5),
      "cross-batch count-sum must equal the one-shot build over the union")
    assert(got.last.n == 1000L)
  }

  test("state is bounded by the bucket domain, not the stream") {
    // 20k values spanning the full magnitude range: resident histogram
    // rows must stay under the (64 - b) * 2^b + 2^b domain bound
    val wide = (1 to 20000).map(i => math.abs(i.toLong * 2654435761L) % (1L << 50))
    val got = drive(tmpDir("squant2"), Seq(wide))
    assert(got.last.histBuckets <= (64 - 5 + 1) * 32L,
      s"resident buckets ${got.last.histBuckets} must be domain-bounded")
    assert(got.last.n == 20000L)
  }

  test("an empty first batch reads as n = 0, never a crash") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Long]
    val buf = scala.collection.mutable.Buffer[StreamingQuantiles.Readout]()
    val q = StreamingQuantiles.run(ms.toDF().toDF("x"), tmpDir("squant3"),
      5, qs, buf.append(_))
    try q.processAllAvailable() finally q.stop()
    assert(buf.isEmpty || (buf.last.n == 0L && buf.last.quantiles.isEmpty))
  }

  test("restart resumes the histogram from the checkpoint") {
    implicit val sq = spark.sqlContext
    val dir = tmpDir("squant4")
    val ms = MemoryStream[Long]
    val buf = scala.collection.mutable.Buffer[StreamingQuantiles.Readout]()
    val q1 = StreamingQuantiles.run(ms.toDF().toDF("x"), dir, 5, qs, buf.append(_))
    try { ms.addData((1L to 800L): _*); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = StreamingQuantiles.run(ms.toDF().toDF("x"), dir, 5, qs, buf.append(_))
    try { ms.addData((801L to 1000L): _*); q2.processAllAvailable() }
    finally q2.stop()
    assert(buf.last.quantiles == batchQuantiles((1L to 1000L), 5),
      "pre-restart bucket counts must survive in the engine's aggregate state")
    assert(buf.last.n == 1000L)
  }

  test("the shared knob contract is loud before the query starts") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Long]
    intercept[IllegalArgumentException](StreamingQuantiles.run(
      ms.toDF().toDF("x"), tmpDir("squant5"), 0, qs, _ => ()))
    intercept[IllegalArgumentException](StreamingQuantiles.run(
      ms.toDF().toDF("x"), tmpDir("squant6"), 5, Seq(900, 500), _ => ()))
  }
}
