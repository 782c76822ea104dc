package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming A/B monitor: cumulative complete-mode counts across live
  * micro-batches, the per-batch readout pinned doc-for-doc against the
  * batch `ab_test_chi2` on the concatenated units, and restart recovery
  * through the engine's checkpointed aggregate state. */
class StreamingAbMonitorSpec extends SparkSpec {
  import spark.implicits._

  test("counts accumulate across batches; readout equals the batch operator") {
    val b1 = Seq((0, 1), (0, 0), (1, 1), (1, 1))
    val b2 = Seq((0, 0), (0, 0), (1, 1), (1, 0))
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Int, Int)]
    val buf = scala.collection.mutable.Buffer[StreamingAbMonitor.Readout]()
    val q = StreamingAbMonitor.run(
      ms.toDF().toDF("variant", "converted"), tmpDir("abmon1"), buf.append(_))
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val last = buf.last
    assert((last.nA, last.convA, last.nB, last.convB) == ((4L, 1L, 4L, 3L)))
    val batch = graft.operators.EventOps.abTestChi2(
      (b1 ++ b2).toDF("variant", "converted")).collect()(0)
    assert(last.chi2Milli == batch.getLong(7) && last.liftPm == batch.getLong(6)
      && last.significant == (batch.getInt(8) == 1),
      "the streaming readout must equal the batch operator on the same units")
  }

  test("a one-armed early stream is guarded, not a crash") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Int, Int)]
    val buf = scala.collection.mutable.Buffer[StreamingAbMonitor.Readout]()
    val q = StreamingAbMonitor.run(
      ms.toDF().toDF("variant", "converted"), tmpDir("abmon2"), buf.append(_))
    try {
      ms.addData((0, 1), (0, 0)); q.processAllAvailable()
    } finally q.stop()
    val r = buf.last
    assert(r.nB == 0L && r.chi2Milli == 0L && !r.significant)
    assert(r.liftPm == -500L, "lift still reads from the guarded rates")
  }

  test("significance flips as evidence accumulates") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Int, Int)]
    val buf = scala.collection.mutable.Buffer[StreamingAbMonitor.Readout]()
    val q = StreamingAbMonitor.run(
      ms.toDF().toDF("variant", "converted"), tmpDir("abmon3"), buf.append(_))
    try {
      // 30% vs 45% at n=20/arm: chi2 ~ 0.96, noise
      ms.addData(Seq.fill(6)((0, 1)) ++ Seq.fill(14)((0, 0)) ++
        Seq.fill(9)((1, 1)) ++ Seq.fill(11)((1, 0)): _*)
      q.processAllAvailable()
      val early = buf.last
      // same rates at n=200/arm: chi2 ~ 9.6
      ms.addData(Seq.fill(54)((0, 1)) ++ Seq.fill(126)((0, 0)) ++
        Seq.fill(81)((1, 1)) ++ Seq.fill(99)((1, 0)): _*)
      q.processAllAvailable()
      val late = buf.last
      assert(!early.significant && early.chi2Milli < 3841L)
      assert(late.significant && late.chi2Milli > 3841L)
      assert(late.batchId > early.batchId)
    } finally q.stop()
  }

  test("restart resumes the cumulative counts from the checkpoint") {
    implicit val sq = spark.sqlContext
    val dir = tmpDir("abmon4")
    val ms = MemoryStream[(Int, Int)]
    val buf = scala.collection.mutable.Buffer[StreamingAbMonitor.Readout]()
    val q1 = StreamingAbMonitor.run(
      ms.toDF().toDF("variant", "converted"), dir, buf.append(_))
    try {
      ms.addData((0, 1), (1, 0)); q1.processAllAvailable()
    } finally q1.stop()
    assert(buf.last.nA == 1L && buf.last.nB == 1L)
    val q2 = StreamingAbMonitor.run(
      ms.toDF().toDF("variant", "converted"), dir, buf.append(_))
    try {
      ms.addData((0, 0), (1, 1)); q2.processAllAvailable()
    } finally q2.stop()
    val r = buf.last
    assert((r.nA, r.convA, r.nB, r.convB) == ((2L, 1L, 2L, 1L)),
      "the pre-restart units must survive in the engine's aggregate state")
  }
}
