package graft.streaming

import graft.SparkSpec
import graft.streaming.LogSchema.LogEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The point of the CEP generalization: a NEW pattern (the reference shape
  * after UserJumpDetailApp's — e.g. a home→detail→order funnel) is a
  * [[Sequence.Pattern]] value, not another hand-rolled
  * flatMapGroupsWithState operator. Exercises both output modes the
  * helper supports: completed matches (conversion funnel) and timed-out
  * partials (abandonment, the bounce family). */
class SequenceSpec extends SparkSpec {
  import spark.implicits._

  private def at(mid: String, page: String, ts: Long) =
    LogEvent(mid, "0", page, if (page == "home") "" else "home", hasStart = false, ts)

  private val funnel = Sequence.Pattern[LogEvent](
    steps = IndexedSeq(_.pageId == "home", _.pageId == "detail", _.pageId == "order"),
    withinMs = 30000L,
    eventTs = _.ts,
    emitTimedOut = false,
    emitMatched = true)

  test("3-step funnel, emitMatched: strict contiguity and the within window hold") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    val q = Sequence.detect(BounceDetect.withEventTime(ms.toDF()).as[LogEvent], funnel)(_.mid)
      .writeStream.format("memory").queryName("funnel").outputMode("append").start()
    try {
      ms.addData(
        // u1 converts: home -> detail -> order inside 30 s
        at("u1", "home", 1000L), at("u1", "detail", 5000L), at("u1", "order", 9000L),
        // u2 breaks strict contiguity: a cart view between detail and order
        at("u2", "home", 1000L), at("u2", "detail", 5000L),
        at("u2", "cart", 7000L), at("u2", "order", 9000L),
        // u3 completes but outside the 30 s window
        at("u3", "home", 1000L), at("u3", "detail", 5000L), at("u3", "order", 40000L))
      q.processAllAvailable()
      val out = spark.table("funnel").as[LogEvent].collect()
      assert(out.map(e => (e.mid, e.pageId, e.ts)).toSeq == Seq(("u1", "order", 9000L)))
    } finally q.stop()
  }

  test("same steps, emitTimedOut: abandoned funnels surface via the timeout path") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    val abandoned = funnel.copy(emitTimedOut = true, emitMatched = false)
    val q = Sequence.detect(BounceDetect.withEventTime(ms.toDF()).as[LogEvent], abandoned)(_.mid)
      .writeStream.format("memory").queryName("abandoned").outputMode("append").start()
    try {
      ms.addData(
        at("u1", "home", 1000L), at("u1", "detail", 5000L), at("u1", "order", 9000L),
        at("u4", "home", 2000L), at("u4", "detail", 6000L)) // never orders
      q.processAllAvailable()
      // heartbeat advances the watermark past u4's 2000+30000 timeout
      ms.addData(at("u5", "cart", 60000L))
      q.processAllAvailable()
      val out = spark.table("abandoned").as[LogEvent].collect()
      // the timed-out partial emits its ANCHOR (Flink timeout side-output
      // parity): u4's home entry; u1 completed and is discarded
      assert(out.map(e => (e.mid, e.pageId, e.ts)).toSeq == Seq(("u4", "home", 2000L)))
    } finally q.stop()
  }

  test("followedBy (strict=false): a non-matching interruption is skipped, not fatal") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    val q = Sequence.detect(
        BounceDetect.withEventTime(ms.toDF()).as[LogEvent],
        funnel.copy(strict = false))(_.mid)
      .writeStream.format("memory").queryName("followed").outputMode("append").start()
    try {
      ms.addData(
        // u2's cart view between detail and order killed the STRICT match;
        // under followedBy it is skipped and the funnel completes
        at("u2", "home", 1000L), at("u2", "detail", 5000L),
        at("u2", "cart", 7000L), at("u2", "order", 9000L),
        // the within window still binds under followedBy: u3's order
        // arrives past 30 s of the anchor and must not complete
        at("u3", "home", 1000L), at("u3", "detail", 5000L), at("u3", "order", 40000L))
      q.processAllAvailable()
      val out = spark.table("followed").as[LogEvent].collect()
      assert(out.map(e => (e.mid, e.pageId, e.ts)).toSeq == Seq(("u2", "order", 9000L)))
    } finally q.stop()
  }

  test("single-partial overlap semantics: a skipped anchor candidate never starts a concurrent run") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    // followedBy home -> order, with TWO home anchors before one order.
    // Flink's default noSkip would emit a match per anchor: (home@1s,
    // order@5s) AND (home@2s, order@5s). The single-run encoding keeps
    // one partial (anchored at home@1s); home@2s is skipped and does NOT
    // start a concurrent run — exactly one match comes out. This pins
    // the documented deviation (Sequence scaladoc: after-match /
    // overlap semantics).
    val p = Sequence.Pattern[LogEvent](
      steps = IndexedSeq(_.pageId == "home", _.pageId == "order"),
      withinMs = 30000L, eventTs = _.ts,
      emitTimedOut = false, emitMatched = true, strict = false)
    val q = Sequence.detect(BounceDetect.withEventTime(ms.toDF()).as[LogEvent], p)(_.mid)
      .writeStream.format("memory").queryName("overlap").outputMode("append").start()
    try {
      ms.addData(
        at("u1", "home", 1000L), at("u1", "home", 2000L), at("u1", "order", 5000L))
      q.processAllAvailable()
      val out = spark.table("overlap").as[LogEvent].collect()
      assert(out.map(e => (e.pageId, e.ts)).toSeq == Seq(("order", 5000L)),
        s"exactly ONE match (no concurrent runs), got ${out.toSeq}")
    } finally q.stop()
  }

  test("a completing event can re-anchor the next partial match") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    // two-step pattern where the completing event itself satisfies step 1
    val p = Sequence.Pattern[LogEvent](
      steps = IndexedSeq(_.pageId == "home", _.pageId == "home"),
      withinMs = 30000L, eventTs = _.ts,
      emitTimedOut = false, emitMatched = true)
    val q = Sequence.detect(BounceDetect.withEventTime(ms.toDF()).as[LogEvent], p)(_.mid)
      .writeStream.format("memory").queryName("reanchor").outputMode("append").start()
    try {
      // home@1s + home@2s match; home@2s re-anchors and pairs with home@3s
      ms.addData(at("u1", "home", 1000L), at("u1", "home", 2000L), at("u1", "home", 3000L))
      q.processAllAvailable()
      val out = spark.table("reanchor").as[LogEvent].collect().sortBy(_.ts)
      assert(out.map(_.ts).toSeq == Seq(2000L, 3000L))
    } finally q.stop()
  }

  test("detectAll (noSkip): every anchor opens a concurrent run; one match per run") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    // the exact stream the single-partial test pins at ONE match: two
    // home anchors before one order. noSkip tracks both runs, so the
    // order event completes BOTH and is emitted once per match.
    val p = Sequence.Pattern[LogEvent](
      steps = IndexedSeq(_.pageId == "home", _.pageId == "order"),
      withinMs = 30000L, eventTs = _.ts,
      emitTimedOut = false, emitMatched = true, strict = false)
    val q = Sequence.detectAll(BounceDetect.withEventTime(ms.toDF()).as[LogEvent], p)(_.mid)
      .writeStream.format("memory").queryName("noskip").outputMode("append").start()
    try {
      ms.addData(
        at("u1", "home", 1000L), at("u1", "home", 2000L), at("u1", "order", 5000L))
      q.processAllAvailable()
      val out = spark.table("noskip").as[LogEvent].collect()
      assert(out.map(e => (e.pageId, e.ts)).toSeq == Seq(("order", 5000L), ("order", 5000L)),
        s"one match per concurrent run, got ${out.toSeq}")
    } finally q.stop()
  }

  test("detectAll (noSkip): concurrent abandoned runs each emit their own anchor on timeout") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    val p = Sequence.Pattern[LogEvent](
      steps = IndexedSeq(_.pageId == "home", _.pageId == "order"),
      withinMs = 30000L, eventTs = _.ts,
      emitTimedOut = true, emitMatched = false, strict = false)
    val q = Sequence.detectAll(BounceDetect.withEventTime(ms.toDF()).as[LogEvent], p)(_.mid)
      .writeStream.format("memory").queryName("noskiptimeout").outputMode("append").start()
    try {
      // two anchors, no order; a cross-batch heartbeat drives the
      // watermark past BOTH deadlines — both anchors surface (the
      // single-run encoding could only ever report the first)
      ms.addData(at("u1", "home", 1000L), at("u1", "home", 2000L))
      q.processAllAvailable()
      ms.addData(at("u9", "cart", 80000L))
      q.processAllAvailable()
      val out = spark.table("noskiptimeout").as[LogEvent].collect().sortBy(_.ts)
      assert(out.map(e => (e.pageId, e.ts)).toSeq ==
        Seq(("home", 1000L), ("home", 2000L)),
        s"each abandoned run emits its anchor, got ${out.toSeq}")
    } finally q.stop()
  }

  test("detectAll under strict contiguity: a wrong successor kills only its own runs") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    // strict home->order: home@1s is killed by home@2s (wrong successor
    // under `next`), which itself anchors a fresh run that completes —
    // noSkip does not resurrect killed runs, it only tracks LIVE ones
    val p = Sequence.Pattern[LogEvent](
      steps = IndexedSeq(_.pageId == "home", _.pageId == "order"),
      withinMs = 30000L, eventTs = _.ts,
      emitTimedOut = false, emitMatched = true, strict = true)
    val q = Sequence.detectAll(BounceDetect.withEventTime(ms.toDF()).as[LogEvent], p)(_.mid)
      .writeStream.format("memory").queryName("noskipstrict").outputMode("append").start()
    try {
      ms.addData(
        at("u1", "home", 1000L), at("u1", "home", 2000L), at("u1", "order", 5000L))
      q.processAllAvailable()
      val out = spark.table("noskipstrict").as[LogEvent].collect()
      assert(out.map(e => (e.pageId, e.ts)).toSeq == Seq(("order", 5000L)),
        s"strict kills the interrupted run; exactly one survives, got ${out.toSeq}")
    } finally q.stop()
  }

  test("stateFnMulti: a cross-batch straggler never opens a run (stateFn's drop contract)") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val p = Sequence.Pattern[LogEvent](
      steps = IndexedSeq(_.pageId == "home", _.pageId == "order"),
      withinMs = 30000L, eventTs = _.ts,
      emitTimedOut = true, emitMatched = true, strict = false)
    val s1 = TestGroupState.create[Seq[Seq[LogEvent]]](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(0L), hasTimedOut = false)
    val out1 = Sequence.stateFnMulti(p)("u1", Iterator(at("u1", "home", 50000L)), s1).toSeq
    assert(out1.isEmpty && s1.get.map(_.map(_.ts)) == Seq(Seq(50000L)))
    // batch 2: a late home@10s, older than the newest matched event — its
    // successors may have been processed and FORGOTTEN in earlier batches,
    // so it must not open a run whose only possible outcome is a spurious
    // timed-out anchor (an "abandoned visit" that was actually resolved)
    val s2 = TestGroupState.create[Seq[Seq[LogEvent]]](
      Optional.of(s1.get), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(45000L), hasTimedOut = false)
    val out2 = Sequence.stateFnMulti(p)("u1", Iterator(at("u1", "home", 10000L)), s2).toSeq
    assert(out2.isEmpty, s"straggler must produce nothing, got $out2")
    assert(s2.get.map(_.map(_.ts)) == Seq(Seq(50000L)),
      "the straggler must not open a run; the live run is untouched")
  }
}
