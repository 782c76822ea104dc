package graft.sources

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong

/** AQE skew-join on a hot-key fact: the one adaptive-execution behavior
  * the uniform fixtures never trip (DppSpec's charter, for skew). A
  * fact where ONE key holds half the rows joins a uniform dim with
  * broadcast disabled — the shape that strands a 100 TB shuffle join on
  * one straggler task unless OptimizeSkewedJoin splits the hot
  * partition. Both the MECHANISM (the finalized adaptive plan's
  * SortMergeJoin reports isSkewJoin = true) and the EFFECT (the largest
  * per-task shuffle read shrinks by >= 2x vs the same join with skew
  * handling off; row counts agree) are asserted, so a regression in
  * either the conf wiring or the optimizer fails CI. Thresholds are
  * scaled to the fixture (factor 2, 128 KiB threshold, 64 KiB advisory
  * target) — at production scale the defaults (5x median, 256 MiB)
  * play the same role against real partition sizes. */
class SkewJoinSpec extends SparkSpec {

  private lazy val factDir: String = {
    val dir = tmpDir("skew_fact")
    // key 0 holds every even row (~50% of the fact); the rest spread
    // uniformly over the 1000-key domain. The payload makes partition
    // bytes meaningful against the scaled-down skew thresholds.
    spark.range(400000).selectExpr(
        "IF(id % 2 = 0, 0L, id % 1000) AS k",
        "repeat('x', 64) AS payload")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private lazy val dimDir: String = {
    val dir = tmpDir("skew_dim")
    spark.range(1000).selectExpr("id AS k", "repeat('d', 64) AS dpayload")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def smjNodes(p: SparkPlan): Seq[SortMergeJoinExec] = p.collect {
    case s: SortMergeJoinExec => Seq(s)
    case a: AdaptiveSparkPlanExec => smjNodes(a.executedPlan)
    case qs: QueryStageExec => smjNodes(qs.plan)
    case r: ReusedExchangeExec => smjNodes(r.child)
  }.flatten

  /** Runs the hot-key join with skew handling on/off; returns (row
    * count, max per-task shuffle-read bytes, skew-join fired). */
  private def run(skew: Boolean): (Long, Long, Boolean) = {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> skew.toString,
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "131072",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536")
    val saved = confs.map { case (key, _) => key -> spark.conf.getOption(key) }
    confs.foreach { case (key, v) => spark.conf.set(key, v) }
    val maxTask = new AtomicLong(0)
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          maxTask.getAndUpdate(cur => math.max(cur,
            m.shuffleReadMetrics.totalBytesRead))
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val q = spark.read.parquet(factDir)
        .join(spark.read.parquet(dimDir), "k")
        .agg(count(lit(1)).as("n"))
      val n = q.collect()(0).getLong(0)
      Thread.sleep(500) // let task-end events drain
      val fired = smjNodes(q.queryExecution.executedPlan).exists(_.isSkewJoin)
      (n, maxTask.get, fired)
    } finally {
      spark.sparkContext.removeSparkListener(l)
      saved.foreach {
        case (key, Some(v)) => spark.conf.set(key, v)
        case (key, None) => spark.conf.unset(key)
      }
    }
  }

  test("OptimizeSkewedJoin fires: the finalized SMJ reports isSkewJoin") {
    val (n, _, fired) = run(skew = true)
    assert(n == 400000L, s"every fact row matches the dim, got $n")
    assert(fired, "the adaptive plan must mark the hot-partition join skew-split")
  }

  test("the effect: the straggler task shrinks >= 2x; answers agree") {
    val (nOn, maxOn, _) = run(skew = true)
    val (nOff, maxOff, firedOff) = run(skew = false)
    assert(nOn == nOff, "skew splitting must not change the answer")
    assert(!firedOff, "control run must not skew-split")
    assert(maxOn > 0 && maxOff > 0, s"task metrics missing: on=$maxOn off=$maxOff")
    info(s"max per-task shuffle read: skew-on $maxOn B, skew-off $maxOff B " +
      f"(${maxOff.toDouble / maxOn}%.1fx straggler relief)")
    assert(maxOn * 2 <= maxOff,
      s"hot partition must split: max task read $maxOn vs $maxOff bytes")
  }
}
