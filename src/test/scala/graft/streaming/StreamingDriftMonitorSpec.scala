package graft.streaming

import graft.SparkSpec
import graft.functions.Portable.{MIX, P}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** StreamingDriftMonitor: cumulative hashed-bigram counts vs an offline
  * reference — in-JVM TVD replay, the zero-drift identity, the drift flip
  * as divergent data floods in, the empty-stream sentinel, restart
  * resumption and loud guards.
  */
class StreamingDriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def toDF(texts: Seq[String]) = texts.toDF("text")

  /** Plain-Scala replay sharing NO code with the operator: tokens →
    * char polyhash → bigram bucket → counts → integer ppb TVD. */
  private def replayTvd(stream: Seq[String], ref: Seq[String]): Long = {
    def bkts(texts: Seq[String]): Map[Long, Long] = texts
      .flatMap { t =>
        val th = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
          .map(_.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % P))
        th.sliding(2).filter(_.length == 2)
          .map(w => ((w(0) * MIX + w(1)) % P) % 8192)
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (so, sc) = (bkts(stream), bkts(ref))
    val n = so.values.sum; val nr = sc.values.sum
    if (n == 0) return 1000000000L
    (so.keySet ++ sc.keySet).toSeq.map { b =>
      math.abs(so.getOrElse(b, 0L) * 1000000000L / n -
        sc.getOrElse(b, 0L) * 1000000000L / nr)
    }.sum / 2
  }

  private def collectReadouts(stream: MemoryStream[String],
      ref: Seq[String], name: String, threshold: Long = 100000000L)(
      feed: (org.apache.spark.sql.streaming.StreamingQuery) => Unit)
      : Seq[StreamingDriftMonitor.Readout] = {
    val buf = scala.collection.mutable.Buffer[StreamingDriftMonitor.Readout]()
    val q = StreamingDriftMonitor.run(stream.toDF().toDF("text"),
      StreamingDriftMonitor.referenceCounts(toDF(ref)),
      tmpDir(name), threshold, buf.append(_))
    try feed(q) finally q.stop()
    buf.toSeq
  }

  private val refTexts = Seq("the cat sat on the mat", "the dog ran to the cat",
    "a cat and a dog met")

  test("the readout replays the in-JVM TVD over the cumulative stream") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[String]
    val b1 = Seq("the cat sat", "a dog ran")
    val b2 = Seq("the mat and the dog")
    val outs = collectReadouts(ms, refTexts, "drift_replay") { q =>
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
    }
    assert(outs.size == 2)
    assert(outs(0).tvdPpb == replayTvd(b1, refTexts))
    assert(outs(1).tvdPpb == replayTvd(b1 ++ b2, refTexts),
      "complete mode: batch 2 scores the CUMULATIVE distribution")
  }

  test("a stream distributed exactly like the reference reads zero drift") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[String]
    val outs = collectReadouts(ms, refTexts, "drift_zero") { q =>
      ms.addData(refTexts: _*); q.processAllAvailable()
    }
    assert(outs.map(r => (r.tvdPpb, r.drifted)) == Seq((0L, false)))
  }

  test("divergent data flips the drift flag as it floods the cumulative counts") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[String]
    val alien = Seq.fill(30)("zq xv qq zz xx vv zq xv")
    val outs = collectReadouts(ms, refTexts, "drift_flip", threshold = 500000000L) { q =>
      ms.addData(refTexts: _*); q.processAllAvailable()
      ms.addData(alien: _*); q.processAllAvailable()
    }
    assert(!outs(0).drifted && outs(1).drifted,
      s"expected flip, got ${outs.map(r => (r.tvdPpb, r.drifted))}")
    assert(outs(1).tvdPpb == replayTvd(refTexts ++ alien, refTexts))
  }

  test("an empty stream is maximal drift by contract, never a division error") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[String]
    val outs = collectReadouts(ms, refTexts, "drift_empty") { q =>
      ms.addData("x") // one token: zero bigrams
      q.processAllAvailable()
    }
    assert(outs.map(r => (r.nBigrams, r.tvdPpb, r.drifted)) ==
      Seq((0L, 1000000000L, true)))
  }

  test("restart resumes the cumulative counts from the checkpoint") {
    implicit val sq = spark.sqlContext
    val dir = tmpDir("drift_restart")
    val ms = MemoryStream[String]
    val buf = scala.collection.mutable.Buffer[StreamingDriftMonitor.Readout]()
    def go() = StreamingDriftMonitor.run(ms.toDF().toDF("text"),
      StreamingDriftMonitor.referenceCounts(toDF(refTexts)),
      dir, 100000000L, buf.append(_))
    val b1 = Seq("the cat sat", "a dog ran")
    val q1 = go()
    try { ms.addData(b1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = go()
    val b2 = Seq("the mat and the dog")
    try { ms.addData(b2: _*); q2.processAllAvailable() } finally q2.stop()
    assert(buf.last.tvdPpb == replayTvd(b1 ++ b2, refTexts),
      "post-restart readout includes the pre-restart counts")
  }

  test("guards are loud") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[String]
    intercept[IllegalArgumentException](StreamingDriftMonitor.run(
      ms.toDF().toDF("text"),
      StreamingDriftMonitor.referenceCounts(toDF(Seq("x"))),
      tmpDir("drift_bad1"), 0L, _ => ()))
    intercept[IllegalArgumentException](StreamingDriftMonitor.run(
      ms.toDF().toDF("text"),
      StreamingDriftMonitor.referenceCounts(toDF(refTexts)),
      tmpDir("drift_bad2"), 2000000000L, _ => ()))
  }
}
