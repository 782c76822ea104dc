package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming FK monitor: one running row of state, pinned against the
  * batch gate's fact-side numbers over the concatenated stream, the
  * orphan-rate climb as a lagging dim drops keys, null/empty handling,
  * restart recovery and the loud dim contract. */
class StreamingFkMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def dim(pks: Seq[java.lang.Long]) = pks.toDF("pk")

  private def drive(dir: String, d: org.apache.spark.sql.DataFrame,
      batches: Seq[Seq[java.lang.Long]]): Seq[StreamingFkMonitor.Readout] = {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[java.lang.Long]
    val buf = scala.collection.mutable.Buffer[StreamingFkMonitor.Readout]()
    val q = StreamingFkMonitor.run(ms.toDF().toDF("fk"), d, dir, buf.append(_))
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    buf.toSeq
  }

  test("the running readout matches the batch gate's fact-side numbers") {
    val d = dim(Seq(1L, 2L, 3L))
    val b1: Seq[java.lang.Long] = Seq(1L, 2L, 9L)        // one orphan
    val b2: Seq[java.lang.Long] = Seq(3L, null, 8L, 8L)  // one null, two orphans
    val got = drive(tmpDir("sfk1"), d, Seq(b1, b2))
    assert((got.head.nFact, got.head.nFkNull, got.head.nOrphan) == ((3L, 0L, 1L)))
    val want = graft.operators.Extras.fkIntegrity(
      (b1 ++ b2).toDF("fk"), "fk", d, "pk").collect()(0)
    assert((got.last.nFact, got.last.nFkNull, got.last.nOrphan, got.last.orphanPpm)
      == ((want.getLong(0), want.getLong(1), want.getLong(2), want.getLong(3))),
      "cumulative stream state must equal the one-shot batch gate")
  }

  test("a lagging dim reads as a climbing orphan rate") {
    val got = drive(tmpDir("sfk2"), dim(Seq(1L)),
      Seq(Seq(1L, 1L), Seq[java.lang.Long](7L, 8L, 9L)))
    assert(got.head.orphanPpm == 0L && got.last.orphanPpm == 600000L,
      "3 orphans of 5 facts once the unknown keys flood in")
  }

  test("null dim keys match nothing; an empty stream is no verdict") {
    val got = drive(tmpDir("sfk3"), dim(Seq(null, 1L)),
      Seq(Seq[java.lang.Long](), Seq[java.lang.Long](5L)))
    assert(got.head == StreamingFkMonitor.Readout(0L, 0L, 0L, 0L, 0L))
    assert(got.last.nOrphan == 1L, "fk 5 has no non-null partner")
  }

  test("restart resumes the running counters from the checkpoint") {
    implicit val sq = spark.sqlContext
    val dir = tmpDir("sfk4")
    val d = dim(Seq(1L, 2L))
    val ms = MemoryStream[java.lang.Long]
    val buf = scala.collection.mutable.Buffer[StreamingFkMonitor.Readout]()
    val q1 = StreamingFkMonitor.run(ms.toDF().toDF("fk"), d, dir, buf.append(_))
    try { ms.addData(Seq[java.lang.Long](1L, 9L): _*); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = StreamingFkMonitor.run(ms.toDF().toDF("fk"), d, dir, buf.append(_))
    try { ms.addData(Seq[java.lang.Long](2L, 8L): _*); q2.processAllAvailable() }
    finally q2.stop()
    assert((buf.last.nFact, buf.last.nOrphan, buf.last.orphanPpm) ==
      ((4L, 2L, 500000L)),
      "pre-restart counters must survive in the engine's aggregate state")
  }

  test("the dim contract is loud before the query starts") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[java.lang.Long]
    intercept[IllegalArgumentException](StreamingFkMonitor.run(
      ms.toDF().toDF("fk"), dim(Seq(1L)).toDF("nope"), tmpDir("sfk5"), _ => ()))
  }
}
