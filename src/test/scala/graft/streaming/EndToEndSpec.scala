package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end pipeline lifecycle (SURVEY.md §3.1): raw JSON stream ->
  * foreachBatch multi-sink (3-way split written in one pass), plus a
  * watermarked tumbling-window aggregation stream (the DWS shape). */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("P2 multi-sink: one raw stream fans out to start/page/display parquet") {
    implicit val sq = spark.sqlContext
    val out = tmpDir("logpipe")
    val ms = MemoryStream[String]
    val q = LogPipeline.run(spark, ms.toDF(), out)
    try {
      ms.addData(
        """{"common":{"mid":"m1","is_new":"1"},"start":{"entry":"icon"},"ts":1704067200000}""",
        """{"common":{"mid":"m1","is_new":"1"},"page":{"page_id":"home"},"displays":[{"item":"sku_1","pos_id":1}],"ts":1704067201000}""",
        """{"common":{"mid":"m2","is_new":"0"},"page":{"page_id":"detail","last_page_id":"home"},"ts":1704067202000}""")
      q.processAllAvailable()
      ms.addData(
        """{"common":{"mid":"m3","is_new":"0"},"start":{"entry":"notice"},"ts":1704067203000}""")
      q.processAllAvailable()
      assert(spark.read.parquet(s"$out/dwd_start_log").count() == 2)
      assert(spark.read.parquet(s"$out/dwd_page_log").count() == 2)
      val disp = spark.read.parquet(s"$out/dwd_display_log").collect()
      assert(disp.length == 1 && disp.head.getAs[String]("page_id") == "home")
    } finally q.stop()
  }

  test("P1 -> P2: HTTP collector feeds the log pipeline end-to-end") {
    // the reference topology's front half: LoggerController (HTTP) ->
    // Kafka ods_base_log -> BaseLogTask. Here: HttpIngest -> spool ->
    // file stream -> LogPipeline 3-way split, one live chain.
    val spool = tmpDir("e2espool")
    val out = tmpDir("e2eout")
    val srv = new graft.sources.HttpIngest.Server(spool, flushEvery = 10)
    srv.start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def post(record: String): Unit = {
        val req = java.net.http.HttpRequest
          .newBuilder(java.net.URI.create(s"http://localhost:${srv.boundPort}/applog"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            "param=" + java.net.URLEncoder.encode(record, "UTF-8")))
          .header("Content-Type", "application/x-www-form-urlencoded").build()
        assert(client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
          .statusCode() == 200)
      }
      post("""{"common":{"mid":"m1","is_new":"1"},"start":{"entry":"icon"},"ts":1704067200000}""")
      post("""{"common":{"mid":"m1","is_new":"1"},"page":{"page_id":"home"},"displays":[{"item":"sku_1","pos_id":1}],"ts":1704067201000}""")
      srv.flush()
      val q = LogPipeline.run(spark, graft.sources.HttpIngest.source(spark, spool), out)
      try q.processAllAvailable() finally q.stop()
      assert(spark.read.parquet(s"$out/dwd_start_log").count() == 1)
      assert(spark.read.parquet(s"$out/dwd_page_log").count() == 1)
      assert(spark.read.parquet(s"$out/dwd_display_log").count() == 1)
    } finally srv.stop()
  }

  test("P1 -> P3: HTTP CDC feed routes facts per-topic and upserts dims, last write wins") {
    // the reference topology's DB half: Maxwell -> Kafka ods_base_db ->
    // BaseDbTask -> {Kafka facts, Phoenix dims}. Here: HTTP collector ->
    // spool -> file stream -> CdcRouter.run -> {facts parquet partitioned
    // by sink_table, dims upsert log}, then the exactly-once fact view and
    // the keyed dim snapshot over two live micro-batches.
    val spool = tmpDir("cdcspool")
    val out = tmpDir("cdcout")
    val cfg = tmpDir("cdccfg") + "/table_process.csv"
    java.nio.file.Files.write(java.nio.file.Paths.get(cfg),
      ("source_table,operate_type,sink_type,sink_table,sink_columns,sink_pk\n" +
        "order_info,insert,kafka,dwd_order_info,\"id,total_amount\",id\n" +
        "user_info,insert,hbase,dim_user_info,\"id,name\",id\n" +
        "user_info,update,hbase,dim_user_info,\"id,name\",id\n").getBytes)
    val srv = new graft.sources.HttpIngest.Server(spool, flushEvery = 100)
    srv.start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def post(record: String): Unit = {
        val req = java.net.http.HttpRequest
          .newBuilder(java.net.URI.create(s"http://localhost:${srv.boundPort}/applog"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            "param=" + java.net.URLEncoder.encode(record, "UTF-8")))
          .header("Content-Type", "application/x-www-form-urlencoded").build()
        assert(client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
          .statusCode() == 200)
      }
      post("""{"database":"gmall","table":"order_info","type":"insert","data":{"id":"101","total_amount":"49.9","skip_me":"x"}}""")
      post("""{"database":"gmall","table":"user_info","type":"insert","data":{"id":"1","name":"alice","email":"a@x"}}""")
      post("""{"database":"gmall","table":"ignored_tbl","type":"insert","data":{"id":"9"}}""")
      srv.flush()
      val q = CdcRouter.run(spark, graft.sources.HttpIngest.source(spark, spool), cfg, out)
      try {
        q.processAllAvailable()
        // second micro-batch: dim update for the same pk
        post("""{"database":"gmall","table":"user_info","type":"update","data":{"id":"1","name":"alicia","email":"a@y"}}""")
        srv.flush()
        q.processAllAvailable()
      } finally q.stop()

      val facts = CdcRouter.factsExactlyOnce(spark, out).collect()
      assert(facts.length == 1, s"one routed fact, got ${facts.mkString(";")}")
      assert(facts.head.getAs[String]("sink_table") == "dwd_order_info")
      // dynamic column pruning dropped skip_me
      assert(!facts.head.getAs[String]("data").contains("skip_me"))

      val dims = CdcRouter.dimSnapshot(spark, out)
        .select("sink_table", "pk", "data").collect()
      assert(dims.length == 1 && dims.head.getAs[String]("pk") == "1")
      val data = dims.head.getAs[String]("data")
      assert(data.contains("alicia") && !data.contains("email"),
        s"last write wins + pruned to sink_columns, got $data")
    } finally srv.stop()
  }

  test("file-source streaming resumes from checkpoint without reprocessing") {
    val src = tmpDir("logsrc")
    val out = tmpDir("logout")
    def writeFile(name: String, lines: String*): Unit = {
      val p = java.nio.file.Paths.get(src, name)
      java.nio.file.Files.write(p, lines.mkString("\n").getBytes)
    }
    writeFile("b1.jsonl",
      """{"common":{"mid":"m1","is_new":"1"},"page":{"page_id":"home"},"ts":1704067200000}""",
      """{"common":{"mid":"m2","is_new":"0"},"page":{"page_id":"list"},"ts":1704067201000}""")
    val q1 = LogPipeline.run(spark, spark.readStream.text(src), out)
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(s"$out/dwd_page_log").count() == 2)

    // restart from the same checkpoint: only the new file is processed
    writeFile("b2.jsonl",
      """{"common":{"mid":"m3","is_new":"1"},"page":{"page_id":"cart"},"ts":1704067202000}""")
    val q2 = LogPipeline.run(spark, spark.readStream.text(src), out)
    try { q2.processAllAvailable() } finally q2.stop()
    val pages = spark.read.parquet(s"$out/dwd_page_log")
    assert(pages.count() == 3) // 2 + 1, no reprocessing of b1
    assert(pages.select("mid").as[String].collect().sorted.toSeq == Seq("m1", "m2", "m3"))
  }

  test("watermarked tumbling-window aggregation emits closed windows (append)") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String)]
    val agg = ms.toDF().toDF("ets", "etype")
      .withWatermark("ets", "0 seconds")
      .groupBy(window(col("ets"), "1 hour"), col("etype"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      ms.addData((t("2024-01-01 00:10:00"), "view"), (t("2024-01-01 00:20:00"), "view"),
        (t("2024-01-01 00:40:00"), "click"))
      q.processAllAvailable()
      // watermark still at 00:40 -> nothing final yet; advance past 01:00
      ms.addData((t("2024-01-01 01:30:00"), "view"))
      q.processAllAvailable()
      ms.addData((t("2024-01-01 03:00:00"), "view")) // flush the 01:00 window
      q.processAllAvailable()
      val rows = spark.table("winagg")
        .selectExpr("date_format(window.start, 'HH:mm') AS ws", "etype", "n")
        .as[(String, String, Long)].collect().toSet
      assert(rows.contains(("00:00", "view", 2L)))
      assert(rows.contains(("00:00", "click", 1L)))
      assert(rows.contains(("01:00", "view", 1L)))
    } finally q.stop()
  }
}
