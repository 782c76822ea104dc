package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.GroupStateTimeout
import java.sql.Timestamp

/** Streaming MinHash near-dup: cross-batch banded candidates over live
  * micro-batches with bounded, TTL-evicted bucket state. */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  // a 40-token document and a near-identical copy (one token changed at
  // the tail) — the same near-dup shape the salted probe corpus uses; an
  // unrelated document shares no shingles at all
  private val base = ("the quick brown fox jumps over the lazy dog while " +
    "seventeen sleepy cats watch from the warm garden wall and a single " +
    "magpie counts the morning clouds drifting east over the quiet river " +
    "meadow before noon arrives")
  private val near = base.dropRight(5) + "night"
  private val other = ("completely different subject matter entirely about " +
    "industrial metallurgy processes including annealing tempering quenching " +
    "and the crystalline microstructure of carbon steel alloys under repeated " +
    "thermal cycling stress conditions in laboratory furnaces")

  test("near-identical docs pair across micro-batches; unrelated docs never pair") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingNearDup.pairs(
      ms.toDF().toDF("doc_id", "text", "ts"))
    val q = out.writeStream.format("memory").queryName("neardup1")
      .outputMode("append").start()
    try {
      ms.addData((1L, base, t("2024-01-01 00:00:01")),
        (2L, other, t("2024-01-01 00:00:02")))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM neardup1").count() == 0,
        "batch 1 has no near-dups")
      ms.addData((3L, near, t("2024-01-01 00:01:00")))
      q.processAllAvailable()
      val pairs = spark.sql("SELECT DISTINCT doc_a, doc_b FROM neardup1")
        .as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 3L)),
        s"the cross-batch near-copy pairs with its original only, got $pairs")
      val est = spark.sql("SELECT max(est_pm) FROM neardup1").head.getLong(0)
      assert(est >= 750, s"near-identical docs agree on most lanes, got $est")
    } finally q.stop()
  }

  test("in-batch dup pairs immediately; re-delivered doc_id is idempotent") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingNearDup.pairs(ms.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("neardup2")
      .outputMode("append").start()
    try {
      ms.addData((1L, base, t("2024-01-01 00:00:01")),
        (2L, base, t("2024-01-01 00:00:02")))
      q.processAllAvailable()
      val first = spark.sql("SELECT DISTINCT doc_a, doc_b FROM neardup2")
        .as[(Long, Long)].collect().toSet
      assert(first == Set((1L, 2L)), s"exact in-batch copy pairs, got $first")
      val nAfterFirst = spark.sql("SELECT * FROM neardup2").count()
      // at-least-once source re-delivers doc 2: no new pairs, no self-pair
      ms.addData((2L, base, t("2024-01-01 00:00:03")))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM neardup2").count() == nAfterFirst,
        "re-delivery must not emit new pairs")
      val after = spark.sql("SELECT DISTINCT doc_a, doc_b FROM neardup2")
        .as[(Long, Long)].collect().toSet
      assert(after == Set((1L, 2L)), s"still the one pair, got $after")
    } finally q.stop()
  }

  test("bucket cap bounds state: overflow arrivals pair against residents but do not enter state") {
    // exercise stateFn directly (the TestGroupState harness — same
    // pattern as SequenceSpec's straggler test): cap 2, three identical
    // docs arrive in doc_id order
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    val sig = Array.fill(16)(42L)
    def row(id: Long) = StreamingNearDup.BandRow("b", id, sig, 1000L, new Timestamp(1000L))
    val st = TestGroupState.create[StreamingNearDup.BucketState](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(0L), hasTimedOut = false)
    val out = StreamingNearDup.stateFn(2, 750, 60000L)(
      "b", Iterator(row(1), row(2), row(3)), st).toSeq
    // 1-2, 1-3, 2-3 all pair (3 compares against residents 1 and 2)...
    assert(out.map(p => (p.doc_a, p.doc_b)).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // ...but only 1 and 2 are resident (cap 2); doc 4 pairs against them only
    assert(st.get.entries.map(_._1) == List(1L, 2L), "state capped at 2 residents")
    val out2 = StreamingNearDup.stateFn(2, 750, 60000L)(
      "b", Iterator(row(4)), st).toSeq
    assert(out2.map(p => (p.doc_a, p.doc_b)).toSet == Set((1L, 4L), (2L, 4L)),
      "overflow doc still pairs against the resident set")
    assert(st.get.entries.map(_._1) == List(1L, 2L), "cap still holds")
  }

  test("TTL eviction: a bucket times out and a later arrival does not pair with evicted docs") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    val sig = Array.fill(16)(7L)
    def row(id: Long, ems: Long) = StreamingNearDup.BandRow("b", id, sig, ems, new Timestamp(ems))
    val st = TestGroupState.create[StreamingNearDup.BucketState](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(0L), hasTimedOut = false)
    StreamingNearDup.stateFn(64, 750, 1000L)("b", Iterator(row(1, 5000L)), st)
    assert(st.getTimeoutTimestampMs.get() == 6000L, "timeout = newest arrival + ttl")
    // watermark passes the deadline -> Spark invokes with hasTimedOut
    val timedOut = TestGroupState.create[StreamingNearDup.BucketState](
      Optional.of(st.get), GroupStateTimeout.EventTimeTimeout, 10000L,
      Optional.of(10000L), hasTimedOut = true)
    val out = StreamingNearDup.stateFn(64, 750, 1000L)(
      "b", Iterator.empty, timedOut).toSeq
    assert(out.isEmpty && timedOut.isRemoved, "timeout clears the bucket, emits nothing")
    // the next arrival starts a fresh bucket: no pair with the evicted doc
    val fresh = TestGroupState.create[StreamingNearDup.BucketState](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout, 10000L,
      Optional.of(10000L), hasTimedOut = false)
    val out2 = StreamingNearDup.stateFn(64, 750, 1000L)(
      "b", Iterator(row(2, 11000L)), fresh).toSeq
    assert(out2.isEmpty, "evicted docs are gone — no cross-eviction pairs")
  }

  test("stateFn invariants under randomized batches: cap, threshold, order, distinct residents") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    val rnd = new scala.util.Random(424242)
    for (_ <- 1 to 50) {
      val cap = 1 + rnd.nextInt(8)
      val minEst = 500L
      var st = TestGroupState.create[StreamingNearDup.BucketState](
        Optional.empty(), GroupStateTimeout.EventTimeTimeout, 0L,
        Optional.of(0L), hasTimedOut = false)
      for (batch <- 1 to 4) {
        val rows = (1 to 1 + rnd.nextInt(6)).map { _ =>
          // small id/value domains so collisions, re-deliveries, and
          // threshold boundary cases all occur within 50 trials
          StreamingNearDup.BandRow("b", rnd.nextInt(20).toLong,
            Array.fill(16)(rnd.nextInt(3).toLong), batch * 1000L,
            new Timestamp(batch * 1000L))
        }
        val out = StreamingNearDup.stateFn(cap, minEst, 60000L)(
          "b", rows.iterator, st).toSeq
        out.foreach { p =>
          assert(p.doc_a < p.doc_b, s"pairs must be (min, max)-keyed: $p")
          assert(p.est_pm >= minEst && p.est_pm <= 1000,
            s"estimate outside [$minEst, 1000]: $p")
        }
        val entries = st.getOption.map(_.entries).getOrElse(Nil)
        assert(entries.size <= cap, s"state exceeded cap $cap: ${entries.size}")
        assert(entries.map(_._1).distinct.size == entries.size,
          "resident doc ids must be distinct")
        // re-invocation carries the committed state forward
        st = TestGroupState.create[StreamingNearDup.BucketState](
          st.getOption.map(Optional.of[StreamingNearDup.BucketState])
            .getOrElse(Optional.empty()),
          GroupStateTimeout.EventTimeTimeout, 0L,
          Optional.of(0L), hasTimedOut = false)
      }
    }
  }

  test("zero/negative event-time rows still get a TTL: the bucket cannot leak") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    val sig = Array.fill(16)(3L)
    val st = TestGroupState.create[StreamingNearDup.BucketState](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout, 2000L,
      Optional.of(2000L), hasTimedOut = false)
    // ems <= 0 (pre-epoch / unparsed timestamp): state must STILL carry a
    // timeout — an un-evictable bucket would leak for the query lifetime
    StreamingNearDup.stateFn(64, 750, 1000L)(
      "b", Iterator(StreamingNearDup.BandRow("b", 1L, sig, 0L, new Timestamp(0L))), st)
    assert(st.getOption.nonEmpty, "row entered state")
    assert(st.getTimeoutTimestampMs.isPresent &&
      st.getTimeoutTimestampMs.get() == 2001L,
      "timeout set (watermark-clamped) even when maxMs stays 0")
  }

  test("signature width mismatch fails loudly instead of skewing the estimate") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    val st = TestGroupState.create[StreamingNearDup.BucketState](
      Optional.of(StreamingNearDup.BucketState(List((1L, Array.fill(16)(5L))))),
      GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(0L), hasTimedOut = false)
    val narrow = StreamingNearDup.BandRow("b", 2L, Array.fill(8)(5L), 1000L,
      new Timestamp(1000L))
    intercept[IllegalArgumentException] {
      StreamingNearDup.stateFn(64, 750, 60000L)("b", Iterator(narrow), st).toSeq
    }
  }

  test("straggler-only batch clamps the timeout past the watermark instead of crashing") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    val sig = Array.fill(16)(9L)
    val st = TestGroupState.create[StreamingNearDup.BucketState](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout, 500000L,
      Optional.of(500000L), hasTimedOut = false)
    // arrival so old that ems + ttl is far behind the watermark
    StreamingNearDup.stateFn(64, 750, 1000L)(
      "b", Iterator(StreamingNearDup.BandRow("b", 1L, sig, 1000L, new Timestamp(1000L))), st)
    assert(st.getTimeoutTimestampMs.get() == 500001L,
      "timeout must clamp to watermark + 1, never at/behind it")
  }

  test("bucketLoad: CROSS-batch saturation surfaces as overflow telemetry the moment the cap is crossed") {
    // 6 + 6 arrivals of the same text: each batch alone sits under the
    // cap (8), so per-batch profiling would see nothing — the cumulative
    // census crosses it in batch 2 and every one of the 4 band buckets
    // reports (seen = 12, overflow = 4). Exactly the silent-truncation
    // window the pairs query's resident cap opens.
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingNearDup.bucketLoad(
        ms.toDF().toDF("doc_id", "text", "ts"), maxPerBucket = 8)
      .writeStream.format("memory").queryName("bload")
      .outputMode("append").start()
    try {
      ms.addData((1L to 6L).map(i =>
        (i, base, t("2024-01-01 00:00:01"))): _*)
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM bload").count() == 0,
        "under the cap: silence (output bounded by SATURATED buckets only)")
      ms.addData((7L to 12L).map(i =>
        (i, base, t("2024-01-01 00:00:02"))): _*)
      q.processAllAvailable()
      val rows = spark.sql("SELECT bucket, seen, overflow FROM bload")
        .as[(String, Long, Long)].collect().toSeq
      assert(rows.size == 4 && rows.map(_._1).distinct.size == 4,
        s"identical docs share all 4 band buckets, each reports once: $rows")
      assert(rows.forall(r => r._2 == 12L && r._3 == 4L),
        s"cumulative census must read 12 seen / 4 over the cap: $rows")
      // a saturated bucket keeps reporting on every batch that touches it
      ms.addData((13L, base, t("2024-01-01 00:00:03")))
      q.processAllAvailable()
      val again = spark.sql("SELECT seen, overflow FROM bload WHERE seen = 13")
        .as[(Long, Long)].collect().toSeq
      assert(again.size == 4 && again.forall(_._2 == 5L),
        s"batch 3 re-reports the still-saturated buckets: $again")
    } finally q.stop()
  }

  test("bucketLoad: duplicate delivery of a RESIDENT doc_id never inflates overflow") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    val sig = Array.fill(16)(9L)
    def row(id: Long) =
      StreamingNearDup.BandRow("b", id, sig, 1000L, new Timestamp(1000L))
    val st = TestGroupState.create[StreamingNearDup.LoadState](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(10L), hasTimedOut = false)
    // cap 2: ids 1, 2 admitted; 1 re-delivered while resident is ignored
    // (the pair query skips it too — no recall was lost, so no overflow)
    val out1 = StreamingNearDup.loadFn(2, 60000L)(
      "b", Iterator(row(1), row(2), row(1)), st).toSeq
    assert(out1.isEmpty, s"duplicate resident must not count: $out1")
    assert(st.get.ids == List(1L, 2L) && st.get.extra == 0L, st.get.toString)
    // resident 2 re-delivered: ignored; 3 is a genuinely truncated arrival
    val out2 = StreamingNearDup.loadFn(2, 60000L)(
      "b", Iterator(row(2), row(3)), st).toSeq
    assert(out2 == Seq(StreamingNearDup.BucketLoad("b", 3L, 1L)),
      s"seen 3 / overflow 1 expected: $out2")
    // a TRUNCATED id re-delivered counts again — the pair query
    // re-processes it too (it never entered the resident set)
    val out3 = StreamingNearDup.loadFn(2, 60000L)("b", Iterator(row(3)), st).toSeq
    assert(out3 == Seq(StreamingNearDup.BucketLoad("b", 4L, 2L)),
      s"truncated re-delivery counts per arrival: $out3")
  }
}
