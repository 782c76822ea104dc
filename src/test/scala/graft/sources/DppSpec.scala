package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dynamic partition pruning on a date-partitioned fact: the one
  * Catalyst scan-pruning behavior the single-file fixtures never
  * exercise. A partitioned copy of `orders` (hive-layout, one directory
  * per order month) joins a filtered month dimension; with DPP the fact
  * scan must carry a `dynamicpruning` subquery in its partition filters
  * and read only the selected months' files — the mechanism that turns
  * a 100 TB date-partitioned scan into a few-partition read whenever a
  * dim filter pins the date range. Both the plan shape (the
  * dynamicpruning expression) and the EFFECT (files read with DPP <<
  * files read with DPP off) are asserted, so a regression in either the
  * layout or the optimizer wiring fails CI. */
class DppSpec extends SparkSpec {

  private lazy val factDir: String = {
    val dir = tmpDir("dpp_orders")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("o_month").parquet(dir)
    dir
  }

  /** months dimension with a selective flag only discoverable at runtime
    * (a real dim-table filter, not a literal the optimizer could fold
    * into a static partition filter) */
  private lazy val dimDir: String = {
    val dir = tmpDir("dpp_months")
    spark.read.parquet(factDir).select(col("o_month")).distinct()
      .withColumn("season", expr(
        "IF(substring(o_month, 6, 2) IN ('11', '12'), 'peak', 'base')"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def filesRead(dpp: Boolean): (Long, Long) = {
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", dpp.toString)
    try {
      val fact = spark.read.parquet(factDir)
      val dim = spark.read.parquet(dimDir).filter(col("season") === "peak")
      val q = fact.join(dim, "o_month")
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("rev"))
      val n = q.collect()(0).getLong(0)
      // unwrap AQE wrappers: after finalization the scans live inside
      // QueryStageExec nodes, which expose no children to collect()
      def allScans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] = p.collect {
        case s: FileSourceScanExec => Seq(s)
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allScans(qs.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          allScans(r.child)
      }.flatten
      val scans = allScans(q.queryExecution.executedPlan)
      val factScan = scans.filter(_.metadata.get("Location")
        .exists(_.contains("dpp_orders")))
      assert(factScan.nonEmpty, "fact scan must be a FileSourceScan")
      (factScan.map(_.metrics("numFiles").value).sum, n)
    } finally
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
  }

  test("the fact scan carries a dynamicpruning partition filter") {
    val fact = spark.read.parquet(factDir)
    val dim = spark.read.parquet(dimDir).filter(col("season") === "peak")
    val p = fact.join(dim, "o_month")
      .agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"DPP subquery must reach the partitioned scan, plan:\n${p.take(2000)}")
  }

  test("DPP reads only the selected months' files; row counts agree") {
    val (filesOn, nOn) = filesRead(dpp = true)
    val (filesOff, nOff) = filesRead(dpp = false)
    assert(nOn == nOff, "pruning must not change the answer")
    assert(nOn > 0, "the peak-month join must match rows")
    // 2 peak months of ~7 years of order dates: the pruned scan must
    // read a small fraction of the partition files
    assert(filesOn * 3 <= filesOff,
      s"DPP must skip most partitions: read $filesOn vs $filesOff files")
  }
}
