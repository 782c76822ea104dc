package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming URL dedup: batch bit-identity inside one TTL window,
  * keep-first/episode semantics, bounded state, restart recovery. */
class StreamingUrlDedupSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  // crawl variants of two pages plus distinct pages — every canon rule
  // exercised (scheme case, www, utm params, trailing slash, fragment)
  private val urls: Seq[(Long, String)] = Seq(
    1L -> "https://www.news.example.org/story/42?utm_source=feed",
    2L -> "http://news.example.org/story/42/",
    3L -> "HTTPS://NEWS.EXAMPLE.ORG/story/42#comments",
    4L -> "http://example.com/p?id=1",
    5L -> "https://example.com/p/?id=1&utm_campaign=x",
    6L -> "http://example.com/p?id=2",
    7L -> "http://other.example.net/a")

  test("batch bit-identity: one-window streaming verdicts equal the batch dedup") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingUrlDedup.verdicts(ms.toDF().toDF("doc_id", "url", "ts"))
      .writeStream.format("memory").queryName("urld1")
      .outputMode("append").start()
    try {
      // doc_id-ordered delivery across two micro-batches, one TTL window
      ms.addData(urls.take(4).map { case (id, u) =>
        (id, u, t(s"2024-01-01 00:00:0$id")) })
      q.processAllAvailable()
      ms.addData(urls.drop(4).map { case (id, u) =>
        (id, u, t(s"2024-01-01 00:00:0$id")) })
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT doc_id, canonical_id, is_dup FROM urld1")
        .as[(Long, Long, Int)].collect().toSet
      // the batch twin on the same static frame
      val canon = graft.operators.Dedup.urlCanonicalize(
          urls.toDF("doc_id", "url"))
      val exp = canon.alias("c")
        .join(canon.groupBy("url_canon").agg(
          org.apache.spark.sql.functions.min("doc_id").as("canonical_id")),
          "url_canon")
        .selectExpr("doc_id", "canonical_id",
          "CAST(doc_id != canonical_id AS INT) AS is_dup")
        .as[(Long, Long, Int)].collect().toSet
      assert(got == exp, s"streaming $got != batch $exp")
    } finally q.stop()
  }

  test("hashKey variant: the 64-bit group key yields identical verdicts and bounded state") {
    // the 100 TB-intake shape (8-byte shuffle/state keys instead of URL
    // strings) must be semantically invisible on the fixture — same
    // verdicts, same episode behavior; the collision trade is documented
    // on the knob (n^2 / 2^65 over live keys, none reachable here)
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingUrlDedup.verdicts(
        ms.toDF().toDF("doc_id", "url", "ts"), hashKey = true)
      .writeStream.format("memory").queryName("urldh")
      .outputMode("append").start()
    try {
      ms.addData(urls.take(4).map { case (id, u) =>
        (id, u, t(s"2024-01-01 00:00:0$id")) })
      q.processAllAvailable()
      ms.addData(urls.drop(4).map { case (id, u) =>
        (id, u, t(s"2024-01-01 00:00:0$id")) })
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT doc_id, url_canon, canonical_id, is_dup FROM urldh")
        .as[(Long, String, Long, Int)].collect().toSet
      // expectation: the batch twin, with url_canon carried per doc
      val canon = graft.operators.Dedup.urlCanonicalize(
          urls.toDF("doc_id", "url"))
      val exp = canon.alias("c")
        .join(canon.groupBy("url_canon").agg(
          org.apache.spark.sql.functions.min("doc_id").as("canonical_id")),
          "url_canon")
        .selectExpr("doc_id", "url_canon", "canonical_id",
          "CAST(doc_id != canonical_id AS INT) AS is_dup")
        .as[(Long, String, Long, Int)].collect().toSet
      assert(got == exp, s"hashed-key streaming $got != batch $exp")
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows <= 5,
        s"state must stay one row per live canonical URL, got $stateRows")
    } finally q.stop()
  }

  test("TTL expiry opens a new episode with a fresh canonical; state stays bounded") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, String, Timestamp)]
    // 60 s TTL so the second crawl of the page lands after expiry
    val q = StreamingUrlDedup.verdicts(
        ms.toDF().toDF("doc_id", "url", "ts"), ttlMs = 60000L)
      .writeStream.format("memory").queryName("urld2")
      .outputMode("append").start()
    try {
      ms.addData((1L, "http://a.example.com/x", t("2024-01-01 00:00:01")),
        (2L, "http://a.example.com/x/", t("2024-01-01 00:00:02")))
      q.processAllAvailable()
      // advance the watermark far past the TTL with an unrelated URL
      ms.addData((3L, "http://b.example.com/y", t("2024-01-01 01:00:00")))
      q.processAllAvailable()
      ms.addData((4L, "http://a.example.com/x", t("2024-01-01 01:00:01")))
      q.processAllAvailable()
      val verdicts = spark.sql(
        "SELECT doc_id, canonical_id, is_dup FROM urld2 ORDER BY doc_id")
        .as[(Long, Long, Int)].collect().toSeq
      assert(verdicts == Seq((1L, 1L, 0), (2L, 1L, 1), (3L, 3L, 0), (4L, 4L, 0)),
        s"doc 4 must open a NEW episode after TTL expiry, got $verdicts")
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows <= 3,
        s"state must hold only live canonical URLs, got $stateRows rows")
    } finally q.stop()
  }

  test("canonical re-delivery absorbs silently; duplicate re-delivery is consumer-idempotent") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingUrlDedup.verdicts(ms.toDF().toDF("doc_id", "url", "ts"))
      .writeStream.format("memory").queryName("urld3")
      .outputMode("append").start()
    try {
      ms.addData((1L, "http://a.example.com/x", t("2024-01-01 00:00:01")))
      q.processAllAvailable()
      val n1 = spark.sql("SELECT * FROM urld3").count()
      ms.addData((1L, "http://a.example.com/x", t("2024-01-01 00:00:02")))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM urld3").count() == n1,
        "canonical re-delivery must not re-emit")
      ms.addData((2L, "http://a.example.com/x", t("2024-01-01 00:00:03")),
        (2L, "http://a.example.com/x", t("2024-01-01 00:00:04")))
      q.processAllAvailable()
      val dup = spark.sql(
        "SELECT DISTINCT doc_id, canonical_id, is_dup FROM urld3 WHERE doc_id = 2")
        .as[(Long, Long, Int)].collect().toSet
      assert(dup == Set((2L, 1L, 1)),
        s"re-delivered duplicate emits the same deterministic verdict, got $dup")
    } finally q.stop()
  }

  test("restart resumes canonical state from the checkpoint") {
    implicit val sq = spark.sqlContext
    val dir = tmpDir("urld4")
    val ms = MemoryStream[(Long, String, Timestamp)]
    val buf = scala.collection.mutable.Buffer[(Long, Long, Int)]()
    def go() = StreamingUrlDedup.verdicts(ms.toDF().toDF("doc_id", "url", "ts"))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingUrlDedup.UrlVerdict], _: Long) =>
        b.collect().foreach(v => buf.append((v.doc_id, v.canonical_id, v.is_dup)))
        ()
      }
      .option("checkpointLocation", dir).outputMode("append").start()
    val q1 = go()
    try { ms.addData((1L, "http://a.example.com/x", t("2024-01-01 00:00:01")))
      q1.processAllAvailable() } finally q1.stop()
    val q2 = go()
    try { ms.addData((2L, "http://a.example.com/x?utm_source=z", t("2024-01-01 00:00:02")))
      q2.processAllAvailable() } finally q2.stop()
    assert(buf.toSet == Set((1L, 1L, 0), (2L, 1L, 1)),
      s"post-restart arrival must dedup against pre-restart state, got ${buf.toSet}")
  }
}
