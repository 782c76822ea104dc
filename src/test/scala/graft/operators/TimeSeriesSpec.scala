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
}
