package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** StreamingSessionize: the native session_window lifecycle — cross-batch
  * merge, watermark-gated append emission, gap splitting, the late-data
  * drop, and doc-for-doc parity with the shared batch aggregation.
  */
// top-level so Catalyst codegen can construct it (an inner case class
// forces the interpreted fallback with a noisy CompileException per batch)
case class SessEv(user_id: String, sec: Long)

class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1704067200L // epoch seconds

  private type Ev = SessEv
  private val Ev = SessEv

  private def start(ms: MemoryStream[Ev], name: String,
      gap: Int = 30, delay: Int = 10) = {
    val ev = ms.toDF().withColumn("ts", timestamp_seconds(col("sec")))
    StreamingSessionize.sessions(ev, gapSeconds = gap, delaySeconds = delay)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
  }

  private def rows(name: String): Seq[(String, Long, Long, Long)] =
    spark.table(name).select("user_id", "start_us", "end_us", "n_events")
      .as[(String, Long, Long, Long)].collect().sorted.toSeq

  test("events in different micro-batches merge into one session; watermark closes it") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = start(ms, "sess_merge")
    try {
      ms.addData(Ev("u1", base))
      q.processAllAvailable()
      assert(rows("sess_merge").isEmpty, "open session: nothing emitted yet")
      ms.addData(Ev("u1", base + 10)) // second batch, within the 30 s gap
      q.processAllAvailable()
      assert(rows("sess_merge").isEmpty, "merged but still open")
      ms.addData(Ev("u2", base + 100)) // watermark -> base+90 > end base+40
      q.processAllAvailable()
      assert(rows("sess_merge") ==
        Seq(("u1", (base) * 1000000L, (base + 40) * 1000000L, 2L)),
        "one merged session of 2 events, emitted exactly once; u2 still open")
    } finally q.stop()
  }

  test("a gap larger than gapSeconds splits sessions; users isolate") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = start(ms, "sess_split")
    try {
      ms.addData(Ev("u1", base), Ev("u1", base + 100), Ev("u2", base + 100))
      q.processAllAvailable()
      ms.addData(Ev("u3", base + 200)) // watermark base+190 closes all of the above
      q.processAllAvailable()
      assert(rows("sess_split") == Seq(
        ("u1", base * 1000000L, (base + 30) * 1000000L, 1L),
        ("u1", (base + 100) * 1000000L, (base + 130) * 1000000L, 1L),
        ("u2", (base + 100) * 1000000L, (base + 130) * 1000000L, 1L)))
    } finally q.stop()
  }

  test("late-but-inside-delay events merge backward; beyond-watermark events drop") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = start(ms, "sess_late", delay = 60)
    try {
      ms.addData(Ev("u1", base + 100))
      q.processAllAvailable() // watermark base+40
      ms.addData(Ev("u1", base + 80)) // older than max seen, newer than watermark
      q.processAllAvailable()
      ms.addData(Ev("u3", base + 1000)) // watermark base+940
      q.processAllAvailable()
      assert(rows("sess_late") ==
        Seq(("u1", (base + 80) * 1000000L, (base + 130) * 1000000L, 2L)),
        "the late event extended the session backward")
      ms.addData(Ev("u1", base + 5)) // far below watermark: engine drops it
      q.processAllAvailable()
      assert(rows("sess_late").size == 1, "a dropped event emits nothing")
    } finally q.stop()
  }

  test("append emissions match the shared batch aggregation over the same events") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = start(ms, "sess_parity")
    val evs = Seq(Ev("a", base), Ev("a", base + 20), Ev("a", base + 25),
      Ev("b", base + 5), Ev("a", base + 200), Ev("b", base + 210))
    try {
      evs.grouped(2).foreach { g => ms.addData(g: _*); q.processAllAvailable() }
      ms.addData(Ev("zz", base + 10000)) // close everything above
      q.processAllAvailable()
      val batch = StreamingSessionize.sessionAgg(
        evs.toDF().withColumn("ts", timestamp_seconds(col("sec"))), 30)
        .select("user_id", "start_us", "end_us", "n_events")
        .as[(String, Long, Long, Long)].collect().sorted.toSeq
      assert(rows("sess_parity") == batch,
        "one aggregation definition: streaming emissions == batch sessions")
    } finally q.stop()
  }

  test("restart resumes open session state from the checkpoint") {
    // session_window aggregates use their own state-store row format —
    // pin that an open session survives a stop/start and still MERGES
    // with post-restart events (foreachBatch: the memory sink refuses
    // checkpoint recovery)
    implicit val sq = spark.sqlContext
    val dir = tmpDir("sess_restart")
    val ms = MemoryStream[Ev]
    val buf = scala.collection.mutable.Buffer[(String, Long, Long, Long)]()
    def go() = StreamingSessionize.sessions(
        ms.toDF().withColumn("ts", timestamp_seconds(col("sec"))),
        gapSeconds = 30, delaySeconds = 10)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("user_id", "start_us", "end_us", "n_events")
          .as[(String, Long, Long, Long)].collect().foreach(buf.append)
        ()
      }
      .option("checkpointLocation", dir).outputMode("append").start()
    val q1 = go()
    try { ms.addData(Ev("u1", base)); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = go()
    try {
      ms.addData(Ev("u1", base + 10)) // merges with the pre-restart event
      ms.addData(Ev("u9", base + 100)) // watermark closes the merged session
      q2.processAllAvailable()
    } finally q2.stop()
    assert(buf.toSet == Set(("u1", base * 1000000L, (base + 40) * 1000000L, 2L)),
      "the session opened before the restart closed as ONE 2-event session")
  }

  test("guards are loud") {
    val df = Seq(Ev("a", base)).toDF()
      .withColumn("ts", timestamp_seconds(col("sec")))
    intercept[IllegalArgumentException](StreamingSessionize.sessionAgg(df, 0))
    intercept[IllegalArgumentException](StreamingSessionize.sessions(df, 30, -1))
  }
}
