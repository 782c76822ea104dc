package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming HLL UV: register state across live micro-batches, pinned
  * bit-identical to a batch build over the concatenated ids, idempotent
  * under duplicates, and restart-recoverable through the engine's
  * checkpointed aggregate state. */
class StreamingHllUvSpec extends SparkSpec {
  import spark.implicits._

  /** The batch twin: same map-side algebra + estimate over a static frame. */
  private def batchEstimate(ids: Seq[Long], m: Int): (Long, Long) = {
    val (h2, fp) = graft.operators.CorpusOps.hllIdExprs("id")
    val regs = ids.toDF("id")
      .selectExpr(s"$h2 AS h2", s"${graft.operators.CorpusOps.hllVExpr(fp)} AS v")
      .selectExpr(s"h2 % ${m}L AS idx",
        s"${graft.operators.CorpusOps.hllRhoExpr("v", m)} AS rho")
      .groupBy(col("idx")).agg(max(col("rho")).as("mj"))
    val r = graft.operators.CorpusOps.hllEstimate(regs, m, Seq.empty).collect()(0)
    (r.getLong(1), r.getLong(0))
  }

  private def drive(m: Int, dir: String,
      batches: Seq[Seq[Long]]): Seq[StreamingHllUv.Readout] = {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Long]
    val buf = scala.collection.mutable.Buffer[StreamingHllUv.Readout]()
    val q = StreamingHllUv.run(ms.toDF().toDF("id"), dir, m, buf.append(_))
    try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    buf.toSeq
  }

  test("the streaming estimate is bit-identical to the batch build") {
    val b1 = (1L to 400L)
    val b2 = (301L to 900L)
    val got = drive(64, tmpDir("hlluv1"), Seq(b1, b2))
    val (e1, z1) = batchEstimate(b1, 64)
    val (e2, z2) = batchEstimate((b1 ++ b2).distinct, 64)
    assert((got.head.estDistinct, got.head.zeroRegisters) == ((e1, z1)))
    assert((got.last.estDistinct, got.last.zeroRegisters) == ((e2, z2)),
      "cross-batch max-merge must equal the one-shot build over the union")
    // and the estimate is actually near truth (900 distinct, ~13% regime)
    assert(math.abs(got.last.estDistinct - 900L) < 250L)
  }

  test("duplicate ids never move the estimate (idempotent max)") {
    val ids = (1L to 200L)
    val got = drive(64, tmpDir("hlluv2"), Seq(ids, ids, ids))
    assert(got.map(_.estDistinct).distinct.size == 1,
      "re-delivered batches are absorbed by the register max")
  }

  test("restart resumes the registers from the checkpoint") {
    implicit val sq = spark.sqlContext
    val dir = tmpDir("hlluv3")
    val ms = MemoryStream[Long]
    val buf = scala.collection.mutable.Buffer[StreamingHllUv.Readout]()
    val q1 = StreamingHllUv.run(ms.toDF().toDF("id"), dir, 64, buf.append(_))
    try { ms.addData(1L to 500L: _*); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = StreamingHllUv.run(ms.toDF().toDF("id"), dir, 64, buf.append(_))
    try { ms.addData(501L to 600L: _*); q2.processAllAvailable() }
    finally q2.stop()
    val (want, _) = batchEstimate(1L to 600L, 64)
    assert(buf.last.estDistinct == want,
      "pre-restart registers must survive in the engine's aggregate state")
  }

  test("a bad m is loud before the query starts") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Long]
    intercept[IllegalArgumentException](
      StreamingHllUv.run(ms.toDF().toDF("id"), tmpDir("hlluv4"), 100, _ => ()))
  }
}
