package graft.operators

import graft.SparkSpec
import java.sql.Date

/** Hand-computed regression features for `ts_features`. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("per-segment monthly features: exact total/mean and least-squares slope") {
    val dir = tmpDir("tsf")
    Seq((1L, "SEG_A"), (2L, "SEG_B"))
      .toDF("c_custkey", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq(
      // SEG_A: Jan 40+60, Feb 200, Mar 300 -> series 100, 200, 300:
      // perfect line, slope 100 $/month, mean 200, total 600
      (10L, 1L, Date.valueOf("2024-01-05"), 40.0),
      (11L, 1L, Date.valueOf("2024-01-20"), 60.0),
      (12L, 1L, Date.valueOf("2024-02-10"), 200.0),
      (13L, 1L, Date.valueOf("2024-03-15"), 300.0),
      // SEG_B: two equal months -> slope exactly 0
      (20L, 2L, Date.valueOf("2024-04-01"), 100.0),
      (21L, 2L, Date.valueOf("2024-05-01"), 100.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")

    val out = graft.SparkEntry.queries("ts_features")(spark, dir)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("SEG_A", 3L, 600.0, 200.0, 100.0),
      ("SEG_B", 2L, 200.0, 100.0, 0.0)))
  }

  test("ts_forecast_grouped: a perfect line extrapolates exactly") {
    val dir = tmpDir("tsfc")
    Seq((1L, "SEG_A")).toDF("c_custkey", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq( // 100, 200, 300 over Jan-Mar -> April forecast is exactly 400
      (10L, 1L, Date.valueOf("2024-01-05"), 100.0),
      (11L, 1L, Date.valueOf("2024-02-10"), 200.0),
      (12L, 1L, Date.valueOf("2024-03-15"), 300.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val out = graft.SparkEntry.queries("ts_forecast_grouped")(spark, dir)
      .as[(String, Long, Double, Double)].collect().toSeq
    val aprilIdx = 2024L * 12 + 4
    assert(out == Seq(("SEG_A", aprilIdx, 100.0, 400.0)), s"got $out")
  }

  test("ts_anomaly: single spike among equal months flags iff |z| clears 2 (needs n >= 6)") {
    val dir = tmpDir("tsan")
    Seq((1L, "SEG_A")).toDF("c_custkey", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    // five 100s and one 300: the spike sits at sqrt(5) ~ 2.24 sigma (a
    // single outlier among n equal months sits at sqrt(n-1) sigma — at
    // n = 5 it would be exactly 2.0 and the STRICT inequality drops it)
    val months = Seq("2024-01-15", "2024-02-15", "2024-03-15", "2024-04-15", "2024-05-15")
    val rows = months.zipWithIndex.map { case (d, i) =>
      (10L + i, 1L, Date.valueOf(d), 100.0)
    } :+ ((20L, 1L, Date.valueOf("2024-06-15"), 300.0))
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val out = graft.SparkEntry.queries("ts_anomaly")(spark, dir)
      .as[(String, Long, Double, Int)].collect().toSeq
    assert(out == Seq(("SEG_A", 2024L * 12 + 6, 300.0, 1)), s"got $out")
  }

  test("ts_seasonality: month-of-year index is the exact ratio of exact means") {
    val dir = tmpDir("tssea")
    Seq((1L, "SEG_A")).toDF("c_custkey", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq( // Jan: 100 then 300 (mean 200); Feb: 100 twice (mean 100);
         // overall monthly mean 150 -> indices 4/3 and 2/3
      (10L, 1L, Date.valueOf("2023-01-15"), 100.0),
      (11L, 1L, Date.valueOf("2024-01-15"), 300.0),
      (12L, 1L, Date.valueOf("2023-02-15"), 100.0),
      (13L, 1L, Date.valueOf("2024-02-15"), 100.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val out = graft.SparkEntry.queries("ts_seasonality")(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("SEG_A", 1L, 2L, 1600.0 / 1200.0),
      ("SEG_A", 2L, 2L, 800.0 / 1200.0)), s"got $out")
  }
}
