package graft.streaming

import graft.SparkSpec
import graft.streaming.LogSchema.LogEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class UniqueVisitsSpec extends SparkSpec {
  import spark.implicits._

  private val day1 = 1704067200000L
  private val day2 = day1 + 86400000L

  test("daily UV dedup: first session-entry per user per day, state across batches") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    val q = UniqueVisits(BounceDetect.withEventTime(ms.toDF()).as[LogEvent])
      .writeStream.format("memory").queryName("uv").outputMode("append").start()
    try {
      ms.addData(
        LogEvent("m1", "0", "home", "", hasStart = false, day1),          // counted
        LogEvent("m1", "0", "list", "home", hasStart = false, day1 + 10), // mid-session: dropped
        LogEvent("m1", "0", "home", "", hasStart = false, day1 + 5000),   // same day: dropped
        LogEvent("m2", "0", "home", "", hasStart = false, day1))          // counted
      q.processAllAvailable()
      // second batch: same-day duplicate still dropped (state), next day counted
      ms.addData(
        LogEvent("m1", "0", "home", "", hasStart = false, day1 + 9000),
        LogEvent("m1", "0", "home", "", hasStart = false, day2))
      q.processAllAvailable()
      val out = spark.table("uv").as[LogEvent].collect()
      assert(out.map(e => (e.mid, e.ts)).sorted.toSeq ==
        Seq(("m1", day1), ("m1", day2), ("m2", day1)))
    } finally q.stop()
  }

  test("pure-SQL UV form: streaming dropDuplicates on (mid, dt) + watermark") {
    // SURVEY.md §2.6's alternative encoding: watermarked dropDuplicates
    // instead of explicit keyed state.
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    import org.apache.spark.sql.functions._
    val dedup = ms.toDF()
      .filter(col("lastPageId") === "")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", "1 hour")
      .withColumn("dt", date_format(col("ets"), "yyyyMMdd"))
      .dropDuplicates("mid", "dt")
    val q = dedup.writeStream.format("memory").queryName("uv_sql")
      .outputMode("append").start()
    try {
      ms.addData(
        LogEvent("m1", "0", "home", "", hasStart = false, day1),
        LogEvent("m1", "0", "home", "", hasStart = false, day1 + 5000),
        LogEvent("m2", "0", "home", "home2", hasStart = false, day1)) // mid-session
      q.processAllAvailable()
      ms.addData(LogEvent("m1", "0", "home", "", hasStart = false, day2))
      q.processAllAvailable()
      val out = spark.table("uv_sql").select("mid", "dt")
        .as[(String, String)].collect().sorted.toSeq
      assert(out == Seq(("m1", "20240101"), ("m1", "20240102")))
    } finally q.stop()
  }

  test("bounded-state UV form: dropDuplicatesWithinWatermark evicts dedup state") {
    // plain dropDuplicates("mid","dt") holds every (mid, dt) pair forever;
    // the WithinWatermark variant drops state once the watermark passes the
    // event — the 1-day-TTL semantics of the reference, built-in.
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    import org.apache.spark.sql.functions._
    val dedup = ms.toDF()
      .filter(col("lastPageId") === "")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", "1 hour")
      .dropDuplicatesWithinWatermark("mid")
    val q = dedup.writeStream.format("memory").queryName("uv_wwm")
      .outputMode("append").start()
    try {
      ms.addData(
        LogEvent("m1", "0", "home", "", hasStart = false, day1),
        LogEvent("m1", "0", "home", "", hasStart = false, day1 + 5000), // dup: dropped
        LogEvent("m2", "0", "home", "", hasStart = false, day1))
      q.processAllAvailable()
      // advance the watermark past day1 + 1h: m1/m2 dedup state is evicted
      ms.addData(LogEvent("m3", "0", "home", "", hasStart = false, day1 + 10L * 3600000L))
      q.processAllAvailable()
      // next day: m1's state is gone -> counted again (bounded state, TTL parity)
      ms.addData(LogEvent("m1", "0", "home", "", hasStart = false, day2))
      q.processAllAvailable()
      val out = spark.table("uv_wwm").select("mid", "ts").as[(String, Long)]
        .collect().sorted.toSeq
      assert(out == Seq(("m1", day1), ("m1", day2), ("m2", day1),
        ("m3", day1 + 10L * 3600000L)))
    } finally q.stop()
  }
}
