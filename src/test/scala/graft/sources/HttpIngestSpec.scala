package graft.sources

import graft.SparkSpec

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.nio.charset.StandardCharsets

/** Live end-to-end: HTTP POST/GET -> spool files -> streaming read ->
  * parsed rows (the P1 collector path the reference serves with Spring). */
class HttpIngestSpec extends SparkSpec {
  import spark.implicits._

  private def log(mid: String, ts: Long): String =
    s"""{"common":{"mid":"$mid"},"ts":$ts}"""

  test("POST and GET /applog records flow through the spool to a streaming read") {
    val spool = tmpDir("httpspool")
    val srv = new HttpIngest.Server(spool, flushEvery = 100)
    srv.start()
    try {
      val client = HttpClient.newHttpClient()
      val base = s"http://localhost:${srv.boundPort}/applog"
      // form-body POST (the reference's param binding)
      val post = HttpRequest.newBuilder(URI.create(base))
        .POST(BodyPublishers.ofString(
          "param=" + java.net.URLEncoder.encode(log("mid_1", 1000L), "UTF-8")))
        .header("Content-Type", "application/x-www-form-urlencoded").build()
      val r1 = client.send(post, HttpResponse.BodyHandlers.ofString())
      assert(r1.statusCode() == 200)
      assert(r1.body() == log("mid_1", 1000L), "endpoint echoes the record")
      // query-param GET
      val get = HttpRequest.newBuilder(URI.create(
        base + "?param=" + java.net.URLEncoder.encode(log("mid_2", 2000L), "UTF-8"))).GET().build()
      assert(client.send(get, HttpResponse.BodyHandlers.ofString()).statusCode() == 200)
      // raw-body POST (non-form payload)
      val raw = HttpRequest.newBuilder(URI.create(base))
        .POST(BodyPublishers.ofString(log("mid_3", 3000L), StandardCharsets.UTF_8)).build()
      assert(client.send(raw, HttpResponse.BodyHandlers.ofString()).statusCode() == 200)

      srv.flush() // roll the spool file
      val q = HttpIngest.source(spark, spool)
        .writeStream.format("memory").queryName("httpingest").outputMode("append").start()
      try {
        q.processAllAvailable()
        val mids = spark.table("httpingest").as[String].collect()
          .map(v => v.split("\"mid\":\"")(1).takeWhile(_ != '"')).toSet
        assert(mids == Set("mid_1", "mid_2", "mid_3"))
      } finally q.stop()
    } finally srv.stop()
  }

  test("flushEvery rolls files without an explicit flush; batch view sees them") {
    val spool = tmpDir("httpspool2")
    val srv = new HttpIngest.Server(spool, flushEvery = 2)
    srv.start()
    try {
      val client = HttpClient.newHttpClient()
      val base = s"http://localhost:${srv.boundPort}/applog"
      (1 to 4).foreach { i =>
        val req = HttpRequest.newBuilder(URI.create(
          base + "?param=" + java.net.URLEncoder.encode(log(s"m$i", i * 100L), "UTF-8"))).GET().build()
        client.send(req, HttpResponse.BodyHandlers.ofString())
      }
      // 4 records at flushEvery=2 => 2 rolled files, no flush() needed
      assert(HttpIngest.batchSource(spark, spool).count() == 4)
    } finally srv.stop()
  }
}
