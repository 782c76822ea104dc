package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming Benford: 9-row digit state across live micro-batches, pinned
  * bit-identical to the batch screen over the concatenated values, the
  * verdict flip as fabricated data floods in, empty/nonpositive handling,
  * restart recovery, and the shared loud knob. */
class StreamingBenfordSpec extends SparkSpec {
  import spark.implicits._

  /** The batch twin over a single global lane. */
  private def batchVerdict(xs: Seq[Long], flag: Long = 50000L): (Long, Long, Int) = {
    val dig = xs.toDF("x").where(col("x") > 0L)
      .selectExpr("CAST(substring(CAST(x AS STRING), 1, 1) AS BIGINT) AS d")
      .groupBy(col("d")).agg(count(lit(1)).as("c"))
    val r = graft.operators.CorpusOps.benfordReadout(dig, Seq.empty, flag).collect()
    if (r.isEmpty) (0L, 0L, 0) else (r(0).getLong(0), r(0).getLong(1), r(0).getInt(2))
  }

  private def drive(dir: String, flag: Long,
      batches: Seq[Seq[Long]]): Seq[StreamingBenford.Readout] = {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Long]
    val buf = scala.collection.mutable.Buffer[StreamingBenford.Readout]()
    val q = StreamingBenford.run(ms.toDF().toDF("x"), dir, flag, buf.append(_))
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    buf.toSeq
  }

  // floor(10^u) on a uniform grid: the Benford-generating process
  private def benfordian(n: Int): Seq[Long] =
    (0 until n).map(i => math.pow(10.0, 2.0 + 5.0 * i / n).toLong)

  test("the streaming verdict is bit-identical to the batch screen") {
    val b1 = benfordian(800)
    val b2 = (0 until 600).map(i => 4000L + i) // uniform flood, leading 4s
    val got = drive(tmpDir("sbenford1"), 50000L, Seq(b1, b2))
    val w1 = batchVerdict(b1)
    val w2 = batchVerdict(b1 ++ b2)
    assert((got.head.n, got.head.tvdPpm, got.head.suspicious) ==
      ((w1._1, w1._2, w1._3 == 1)))
    assert((got.last.n, got.last.tvdPpm, got.last.suspicious) ==
      ((w2._1, w2._2, w2._3 == 1)))
    assert(!got.head.suspicious && got.last.suspicious,
      "clean Benford stream flips suspicious as the uniform flood arrives")
  }

  test("nonpositive values never enter the aggregate; empty stream is no verdict") {
    val got = drive(tmpDir("sbenford2"), 50000L,
      Seq(Seq(0L, -17L), Seq(17L, 29L, -1L)))
    assert(got.head.n == 0L && !got.head.suspicious,
      "batch of only nonpositives reads n = 0, no verdict")
    assert(got.last.n == 2L, "only the two positive values count")
  }

  test("restart resumes the digit counts from the checkpoint") {
    implicit val sq = spark.sqlContext
    val dir = tmpDir("sbenford3")
    val ms = MemoryStream[Long]
    val buf = scala.collection.mutable.Buffer[StreamingBenford.Readout]()
    val q1 = StreamingBenford.run(ms.toDF().toDF("x"), dir, 50000L, buf.append(_))
    try { ms.addData(benfordian(500): _*); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = StreamingBenford.run(ms.toDF().toDF("x"), dir, 50000L, buf.append(_))
    try { ms.addData((0 until 400).map(i => 7000L + i): _*); q2.processAllAvailable() }
    finally q2.stop()
    val want = batchVerdict(benfordian(500) ++ (0 until 400).map(i => 7000L + i))
    assert((buf.last.n, buf.last.tvdPpm) == ((want._1, want._2)),
      "pre-restart digit counts must survive in the engine's aggregate state")
  }

  test("the shared knob contract is loud before the query starts") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Long]
    intercept[IllegalArgumentException](StreamingBenford.run(
      ms.toDF().toDF("x"), tmpDir("sbenford4"), 0L, _ => ()))
  }
}
