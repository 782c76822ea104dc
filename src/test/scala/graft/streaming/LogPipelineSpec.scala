package graft.streaming

import graft.SparkSpec
import graft.streaming.LogSchema.LogEvent

class LogPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val day1 = 1704067200000L // 2024-01-01 00:00:00 UTC
  private val day2 = day1 + 86400000L

  test("3-way split: start / page / display with parent page_id injection") {
    val raw = Seq(
      s"""{"common":{"mid":"m1","is_new":"1"},"start":{"entry":"icon"},"ts":$day1}""",
      s"""{"common":{"mid":"m1","is_new":"1"},"page":{"page_id":"home"},
         |"displays":[{"item":"sku_1","pos_id":1},{"item":"sku_2","pos_id":2}],"ts":${day1 + 1000}}""".stripMargin.replaceAll("\n", ""),
      s"""{"common":{"mid":"m2","is_new":"0"},"page":{"page_id":"detail","last_page_id":"home"},"ts":${day1 + 2000}}""")
      .toDF("value")
    val parsed = LogSchema.parse(raw)
    assert(LogPipeline.startStream(parsed).collect().map(_.getString(0)).toSeq == Seq("m1"))
    val pages = LogPipeline.pageStream(parsed).collect()
    assert(pages.length == 2)
    val disp = LogPipeline.displayStream(parsed)
      .selectExpr("page_id", "item", "pos_id").collect()
    assert(disp.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet ==
      Set(("home", "sku_1", 1L), ("home", "sku_2", 2L)))
  }

  test("visitor fix: is_new=1 on a later day than first visit is rewritten to 0") {
    val events = Seq(
      LogEvent("m1", "1", "home", "", hasStart = false, day1),
      LogEvent("m1", "1", "home", "", hasStart = false, day1 + 5000), // same day: stays 1
      LogEvent("m1", "1", "home", "", hasStart = false, day2),        // later day: fixed to 0
      LogEvent("m2", "0", "home", "", hasStart = false, day1)         // already old: untouched
    ).toDS()
    val fixed = LogPipeline.fixVisitors(events).collect().sortBy(_.ts)
    assert(fixed.filter(_.mid == "m1").map(_.isNew).toSeq == Seq("1", "1", "0"))
    assert(fixed.filter(_.mid == "m2").map(_.isNew).toSeq == Seq("0"))
  }

  test("visitor fix holds state across streaming micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    val q = LogPipeline.fixVisitors(ms.toDS())
      .writeStream.format("memory").queryName("vfix").outputMode("append").start()
    try {
      ms.addData(LogEvent("m1", "1", "home", "", hasStart = false, day1))
      q.processAllAvailable()
      ms.addData(LogEvent("m1", "1", "home", "", hasStart = false, day2))
      q.processAllAvailable()
      val out = spark.table("vfix").as[LogEvent].collect().sortBy(_.ts)
      assert(out.map(_.isNew).toSeq == Seq("1", "0"))
    } finally q.stop()
  }
}
