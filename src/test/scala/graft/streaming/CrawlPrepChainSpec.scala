package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** The streaming crawl-prep CHAIN: StreamingUrlDedup (front door) →
  * StreamingCuration (quality gate + exact dedup) → StreamingNearDup
  * (LSH candidate pairs) composed as one intake pipeline — the streaming
  * twin of pretrain_prep's stage order 1–3. Each stage is a separate
  * streaming query connected by durable parquet stage boundaries (the
  * production posture: Kafka topics between stages; files here), because
  * three keyed-state operators cannot share one query — and should not:
  * a stage boundary is also the replay point.
  *
  * Each sketch is restart-tested alone in its own suite; THIS suite pins
  * what composition adds — watermark/TTL assumptions meeting across
  * stages, payload rehydration at a boundary, bounded state in all three
  * stores at once, and a checkpoint restart of the WHOLE chain where
  * post-restart arrivals must dedup/pair against pre-restart state in
  * every stage.
  */
class CrawlPrepChainSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  // ~35-token prose; T1b changes ONE word of T1 (shingle jaccard ~0.9 →
  // the LSH banding must pair them); T2 shares no vocabulary run with T1
  private val T1 = "the quick brown fox jumps over the lazy dog while seven crows " +
    "watch from the old oak tree near the river bank and the wind carries autumn " +
    "leaves across the quiet meadow at dusk"
  private val T1b = T1.replace("at dusk", "at dawn")
  private val T2 = "database systems implement multi version concurrency control " +
    "using snapshot isolation write ahead logging and group commit to balance " +
    "throughput latency and durability under mixed transactional workloads"

  /** (doc_id, url, text, lang, ts) — the crawl feed. */
  private val corpus: Seq[(Long, String, String, String, Timestamp)] = Seq(
    (1L, "https://www.crawl.example.org/a?utm_source=x", T1, "en", t("2024-01-01 00:00:01")),
    (2L, "http://crawl.example.org/a/", "different text same page", "en", t("2024-01-01 00:00:02")),
    (3L, "http://crawl.example.org/b", "tiny", "en", t("2024-01-01 00:00:03")),
    (4L, "http://crawl.example.org/c", T1b, "en", t("2024-01-01 00:00:10")),
    (5L, "http://crawl.example.org/d", T1, "en", t("2024-01-01 00:00:11")),
    (6L, "http://crawl.example.org/e", T2, "en", t("2024-01-01 00:00:12")),
    (7L, "HTTPS://CRAWL.EXAMPLE.ORG/a#frag", "third crawl of page a", "en", t("2024-01-01 00:00:13")))

  private val vSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("url_canon", StringType),
    StructField("canonical_id", LongType), StructField("is_dup", IntegerType)))
  private val kSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("ts", TimestampType)))

  /** One harness instance = one set of stage dirs/checkpoints; starting
    * the stages again against the same instance restarts the CHAIN from
    * its checkpoints. */
  private class Chain(hashKey: Boolean = false) {
    val vdir = tmpDir("chain_verdicts")
    val out2 = tmpDir("chain_curation")
    val pdir = tmpDir("chain_pairs")
    val c1 = tmpDir("chain_c1")
    val c3 = tmpDir("chain_c3")
    // the kept log is born on stage 2's first batch, but stage 3's file
    // source validates the path at START — pre-create the boundary
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out2, "kept"))
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, String, String, Timestamp)]
    private val static = corpus
      .toDF("doc_id", "url", "text", "lang", "ts")

    def start(): Seq[StreamingQuery] = {
      // stage 1: URL-canonicalization dedup on the raw crawl feed; the
      // verdict log is the stage boundary
      val q1 = StreamingUrlDedup.verdicts(
          ms.toDF().toDF("doc_id", "url", "text", "lang", "ts"),
          hashKey = hashKey)
        .writeStream.option("checkpointLocation", c1)
        .foreachBatch((b: Dataset[StreamingUrlDedup.UrlVerdict], _: Long) =>
          b.toDF().write.mode("append").parquet(vdir))
        .outputMode("append").start()
      // stage 2: admitted docs rehydrate their payload at the boundary
      // (stream-static join on doc_id — in production the payload rides
      // the topic beside the verdict) and enter the curation gate
      val q2 = StreamingCuration.run(spark,
        spark.readStream.schema(vSchema).parquet(vdir)
          .filter("is_dup = 0").select("doc_id")
          .join(static, "doc_id")
          .select("doc_id", "text", "lang", "ts"),
        out2, horizon = "1 hour")
      // stage 3: the kept log feeds LSH near-dup candidate pairing
      val q3 = StreamingNearDup.pairs(
          spark.readStream.schema(kSchema).parquet(s"$out2/kept")
            .select("doc_id", "text", "ts"))
        .writeStream.option("checkpointLocation", c3)
        .foreachBatch((b: Dataset[StreamingNearDup.CandPair], _: Long) =>
          b.toDF().write.mode("append").parquet(pdir))
        .outputMode("append").start()
      Seq(q1, q2, q3)
    }

    /** Drain the chain front-to-back (file sources discover the new
      * stage-boundary files on their next trigger). */
    def drain(qs: Seq[StreamingQuery]): Unit = qs.foreach(_.processAllAvailable())

    def verdicts(): Map[Long, (Long, Int)] =
      spark.read.parquet(vdir).dropDuplicates("doc_id")
        .select("doc_id", "canonical_id", "is_dup")
        .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def keptIds(): Set[Long] =
      StreamingCuration.kept(spark, out2).select("doc_id").as[Long].collect().toSet
    def rejectedIds(): Set[Long] =
      StreamingCuration.rejected(spark, out2).select("doc_id").as[Long].collect().toSet
    def pairs(): Set[(Long, Long)] =
      spark.read.parquet(pdir).dropDuplicates("doc_a", "doc_b")
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
  }

  private def wave1(ch: Chain) = ch.ms.addData(corpus.take(3))
  private def wave2(ch: Chain) = ch.ms.addData(corpus.slice(3, 6))

  private def assertWave1(ch: Chain): Unit = {
    val v = ch.verdicts()
    assert(v(1L) == ((1L, 0)) && v(2L) == ((1L, 1)) && v(3L) == ((3L, 0)),
      s"stage 1 must admit first crawls and dup the canonical-URL re-crawl, got $v")
    assert(ch.keptIds() == Set(1L), s"stage 2 keeps only the quality survivor, got ${ch.keptIds()}")
    assert(ch.rejectedIds() == Set(3L), "the 1-token doc lands in the rejected audit log")
    assert(ch.pairs().isEmpty, "one resident doc cannot pair")
  }

  private def assertWave2(ch: Chain): Unit = {
    val v = ch.verdicts()
    assert(Seq(4L, 5L, 6L).forall(v(_)._2 == 0),
      s"new URLs admit at stage 1 even when content duplicates upstream docs, got $v")
    // doc 5 is an exact-content twin of doc 1 on a NEW url: stage 1
    // admits it, stage 2's cross-batch digest state collapses it
    // (silently — in-stream dedup, not a quality rejection)
    assert(ch.keptIds() == Set(1L, 4L, 6L),
      s"exact twin must collapse against the PRIOR batch's digest state, got ${ch.keptIds()}")
    assert(ch.rejectedIds() == Set(3L))
    assert(ch.pairs() == Set((1L, 4L)),
      s"stage 3 must pair the one-word-apart texts and nothing else, got ${ch.pairs()}")
  }

  test("the three-stage intake chain composes: URL dedup -> curation -> near-dup pairs") {
    val ch = new Chain
    val qs = ch.start()
    try {
      wave1(ch); ch.drain(qs)
      assertWave1(ch)
      wave2(ch); ch.drain(qs)
      assertWave2(ch)
      // bounded-state witness across ALL THREE stores at once: one row
      // per live canonical URL / digest-in-horizon / resident band bucket
      val states = qs.map(_.lastProgress.stateOperators(0).numRowsTotal)
      assert(states(0) <= 6, s"url-dedup state must be one row per live canonical, got ${states(0)}")
      assert(states(1) <= 6, s"digest-dedup state bounded by horizon distinct content, got ${states(1)}")
      assert(states(2) <= 12, s"band-bucket state bounded by 4 bands x residents, got ${states(2)}")
      assert(states.forall(_ > 0), s"every stage holds live state, got $states")
    } finally qs.foreach(_.stop())
  }

  test("hashed-key front door: the 100 TB intake posture yields identical downstream stages") {
    // the SAME end-to-end assertions as the string-keyed chain — the
    // 8-byte xxhash64 group key slims stage 1's exchange and state store
    // without changing a single verdict, kept/rejected id, or pair on a
    // collision-free corpus (the documented trade; hashKey is fixed per
    // checkpoint location, and this chain's c1 is born hashed)
    val ch = new Chain(hashKey = true)
    val qs = ch.start()
    try {
      wave1(ch); ch.drain(qs)
      assertWave1(ch)
      wave2(ch); ch.drain(qs)
      assertWave2(ch)
    } finally qs.foreach(_.stop())
  }

  test("chain restart: every stage resumes its state from checkpoints (kill between waves)") {
    val ch = new Chain
    val qs1 = ch.start()
    try { wave1(ch); ch.drain(qs1) } finally qs1.foreach(_.stop())
    assertWave1(ch)

    // restart the WHOLE chain, then feed wave 2 plus a third crawl of
    // page a: stage 1 must dup it against PRE-restart canonical state,
    // stage 2 must collapse doc 5 against the PRE-restart digest state,
    // stage 3 must pair doc 4 against the PRE-restart resident signature
    val qs2 = ch.start()
    try {
      ch.ms.addData(corpus.slice(3, 7))
      ch.drain(qs2)
      assertWave2(ch)
      val v = ch.verdicts()
      assert(v(7L) == ((1L, 1)),
        s"post-restart re-crawl must dup against the restored canonical, got ${v(7L)}")
    } finally qs2.foreach(_.stop())
  }
}
