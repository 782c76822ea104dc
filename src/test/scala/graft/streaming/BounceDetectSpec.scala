package graft.streaming

import graft.SparkSpec
import graft.streaming.LogSchema.LogEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Exercises the reference's only semantic test vector: the 4-event CEP
  * fixture at RT/app/dwm/UserJumpDetailApp.java:59-69 (FIXTURES.md §B.2).
  * Expected bounce output: mid 101 only, via the event-time timeout path. */
class BounceDetectSpec extends SparkSpec {
  import spark.implicits._

  test("golden CEP vector: mid 101 bounces, mid 102 does not") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    val events = BounceDetect.withEventTime(ms.toDF()).as[LogEvent]
    val q = BounceDetect(events)
      .writeStream.format("memory").queryName("bounce").outputMode("append").start()
    try {
      ms.addData(
        LogEvent("101", "0", "home", "", hasStart = false, 10000L),
        LogEvent("102", "0", "home", "", hasStart = false, 12000L),
        LogEvent("102", "0", "good_list", "home", hasStart = false, 15000L),
        LogEvent("102", "0", "good_list", "detail", hasStart = false, 30000L))
      q.processAllAvailable()
      // heartbeat advances the watermark past 101's timeout (10000+10000)
      ms.addData(LogEvent("999", "0", "home", "", hasStart = false, 50000L))
      q.processAllAvailable()
      val out = spark.table("bounce").as[LogEvent].collect()
      assert(out.map(_.mid).toSeq == Seq("101"))
      assert(out.head.ts == 10000L)
    } finally q.stop()
  }

  test("intra-batch late successor (> 10 s) also yields a bounce") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    val events = BounceDetect.withEventTime(ms.toDF()).as[LogEvent]
    val q = BounceDetect(events)
      .writeStream.format("memory").queryName("bounce2").outputMode("append").start()
    try {
      ms.addData(
        LogEvent("7", "0", "home", "", hasStart = false, 1000L),
        LogEvent("7", "0", "cart", "home", hasStart = false, 20000L)) // 19 s later
      q.processAllAvailable()
      val out = spark.table("bounce2").as[LogEvent].collect()
      assert(out.map(e => (e.mid, e.ts)).toSeq == Seq(("7", 1000L)))
    } finally q.stop()
  }

  test("a straggler from BEFORE the pending entry does not suppress the bounce") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    val events = BounceDetect.withEventTime(ms.toDF()).as[LogEvent]
    val q = BounceDetect(events)
      .writeStream.format("memory").queryName("bounce3").outputMode("append").start()
    try {
      // entry at t=100 s stored pending (timeout 110 s)
      ms.addData(LogEvent("8", "0", "home", "", hasStart = false, 100000L))
      q.processAllAvailable()
      // a LATE event from t=95 s arrives next batch — flatMapGroupsWithState
      // does not auto-drop it; it must not count as a successor of t=100 s
      ms.addData(LogEvent("8", "0", "cart", "home", hasStart = false, 95000L))
      q.processAllAvailable()
      // heartbeat advances the watermark past the timeout
      ms.addData(LogEvent("999", "0", "home", "", hasStart = false, 200000L))
      q.processAllAvailable()
      val out = spark.table("bounce3").as[LogEvent].collect()
      assert(out.map(e => (e.mid, e.ts)).toSeq == Seq(("8", 100000L)),
        "the t=100 s entry had no real successor within 10 s and must bounce")
    } finally q.stop()
  }
}
