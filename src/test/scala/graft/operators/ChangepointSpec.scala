package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** ts_changepoint: the CUSUM AMOC estimator pinned on hand-computed
  * series — D_i = n·prefix_i − i·total, peak with earliest tie-break,
  * shift direction. Cross-engine exactness is the DuckDB oracle's job
  * at sf0.01.
  */
class ChangepointSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("seg", StringType),
    StructField("m", LongType),
    StructField("rev_c", LongType)))

  private def series(rows: (String, Long, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 2),
      schema)

  test("a step series peaks at the last pre-shift month; up-shift is +1") {
    // [10,10,10,20,20]: D = 5·prefix − i·70 = [-20,-40,-60,-30,0]
    // -> peak |−60| at month 3, cusum_c = 60 div 5 = 12, d < 0 -> +1
    val d = series(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L),
      ("a", 4L, 20L), ("a", 5L, 20L))
    val r = TimeSeries.cusumChangepoint(d).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 3L, "cp_month")
    assert(r(0).getLong(2) == 5L, "n_months")
    assert(r(0).getLong(3) == 12L, "cusum_c")
    assert(r(0).getInt(4) == 1, "mean shifts UP after month 3")
  }

  test("a downward step flips the direction; segments are independent") {
    val d = series(("up", 1L, 0L), ("up", 2L, 0L), ("up", 3L, 30L),
      ("dn", 1L, 30L), ("dn", 2L, 0L), ("dn", 3L, 0L))
    val got = TimeSeries.cusumChangepoint(d).collect()
      .map(r => r.getString(0) -> r.getInt(4)).toMap
    assert(got == Map("up" -> 1, "dn" -> -1))
  }

  test("a constant series has zero cusum and the earliest month as tie-break") {
    val d = series(("c", 1L, 7L), ("c", 2L, 7L), ("c", 3L, 7L))
    val r = TimeSeries.cusumChangepoint(d).collect()
    assert(r(0).getLong(1) == 1L && r(0).getLong(3) == 0L,
      "all D_i = 0 -> earliest month wins the tie")
  }
}
