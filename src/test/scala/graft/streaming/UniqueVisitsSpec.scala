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
}
