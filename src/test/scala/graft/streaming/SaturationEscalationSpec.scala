package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** The saturation-escalation loop CLOSED (the round-15 telemetry's
  * documented response, driven as code): the streaming intake's
  * `bucketLoad` sees the pair query's silent resident truncation as it
  * happens; the operator's escalation — run the nightly batch pass with
  * the profile-gated emitter over the same corpus — is executed here,
  * and the pairs the stream lost are asserted RECOVERED.
  *
  * The spec also pins the semantic bridge both directions rely on:
  * [[Dedup.minhashPairsCappedOf]] at the stream's own cap reproduces the
  * stream's pair set exactly (the "batch twin of maxPerBucket" contract
  * on its scaladoc), so the batch rung's recall gain over the stream is
  * precisely the cap increase, nothing hidden. */
class SaturationEscalationSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  // ~35 tokens so the doc shingles; 12 identical twins saturate one
  // logical near-dup group far past the stream cap of 4
  private val base = "the quick brown fox jumps over the lazy dog while seven " +
    "crows watch from the old oak tree near the river bank and the wind carries " +
    "autumn leaves across the quiet meadow at dusk"
  private val N = 12
  private val StreamCap = 4

  test("overflow telemetry -> batch escalation recovers the recall the stream truncated") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Timestamp)]
    val feed = ms.toDF().toDF("doc_id", "text", "ts")
    // the production posture: the pair query and its load telemetry run
    // side by side over the SAME source at the SAME cap
    val pq = StreamingNearDup.pairs(feed, maxPerBucket = StreamCap)
      .writeStream.format("memory").queryName("esc_pairs")
      .outputMode("append").start()
    val lq = StreamingNearDup.bucketLoad(feed, maxPerBucket = StreamCap)
      .writeStream.format("memory").queryName("esc_load")
      .outputMode("append").start()
    val streamPairs =
      try {
        // each batch alone is modest; saturation is CUMULATIVE (6 + 6
        // over a cap of 4) — the per-batch-blind case the telemetry is for
        ms.addData((1L to 6L).map(i => (i, base, t("2024-01-01 00:00:01"))): _*)
        pq.processAllAvailable(); lq.processAllAvailable()
        ms.addData((7L to 12L).map(i => (i, base, t("2024-01-01 00:00:02"))): _*)
        pq.processAllAvailable(); lq.processAllAvailable()

        // 1. the telemetry SAW the truncation: every band bucket of the
        // twin group reports 12 seen, 8 past the cap
        val load = spark.sql("SELECT bucket, seen, overflow FROM esc_load")
          .as[(String, Long, Long)].collect().toSeq
        val worst = load.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
        assert(worst.size == 4 && worst.values.forall(_ == (N - StreamCap).toLong),
          s"all 4 band buckets must report overflow = ${N - StreamCap}, got $load")

        spark.sql("SELECT doc_a, doc_b FROM esc_pairs")
          .as[(Long, Long)].collect().toSet
      } finally { pq.stop(); lq.stop() }

    // the stream's bounded state truncated real recall: residents {1..4}
    // pair fully and witness every overflow arrival, but overflow docs
    // never pair with each other
    val expectedStream = (for {
      a <- 1 to N; b <- (a + 1) to N; if a <= StreamCap
    } yield (a.toLong, b.toLong)).toSet
    assert(streamPairs == expectedStream,
      s"stream emits resident-resident + resident-overflow only, got $streamPairs")

    // 2. ESCALATE: the nightly batch pass over the same corpus. First the
    // dispatch verdicts — at the stream's own cap the profile refuses the
    // exact emitter (the cap genuinely binds: that is what the overflow
    // telemetry reported), at the batch posture's default cap (64) the
    // group fits residency and the full-recall rung is free.
    val docs = Seq.tabulate(N)(i => (i + 1L, base)).toDF("doc_id", "text")
    assert(Dedup.chooseEmitter(docs, cap = StreamCap) == "capped",
      "at the stream cap the profile must escalate past the exact emitter")
    assert(Dedup.chooseEmitter(docs) == "all",
      "at the batch default cap the group fits — the exact rung is free")

    // 3. the semantic bridge: the batch capped emitter AT the stream's
    // cap reproduces the stream's pair set exactly (maxPerBucket twin)
    val cappedAtStreamCap = Dedup.minhashPairsCappedOf(docs, cap = StreamCap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cappedAtStreamCap == streamPairs,
      s"batch capped@$StreamCap must equal the stream's set, got $cappedAtStreamCap")

    // 4. recovery: the chosen batch rung returns the FULL pair set —
    // everything the stream lost is back
    val batchPairs = Dedup.minhashPairsOf(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val full = (for { a <- 1 to N; b <- (a + 1) to N }
      yield (a.toLong, b.toLong)).toSet
    assert(batchPairs == full, s"the exact rung recovers all pairs, got ${batchPairs.size}")
    val lost = full -- streamPairs
    assert(lost.nonEmpty && lost.subsetOf(batchPairs),
      "the escalation must recover precisely the truncated recall")
  }
}
