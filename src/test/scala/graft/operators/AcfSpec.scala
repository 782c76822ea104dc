package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** ts_acf: the exact-integer autocorrelation pinned on hand series —
  * dev_i = n·x_i − total, acf_ppm = sign · (|Σ dev_i·dev_{i+l}|·10⁶ div
  * Σ dev²) — plus the constant-series guard and the lag ≥ n absence
  * rule. Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class AcfSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("seg", StringType),
    StructField("m", LongType),
    StructField("rev_c", LongType)))

  private def series(rows: (String, Long, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 2),
      schema)

  test("alternating series: negative odd lags, positive even lag") {
    // [1,3,1,3]: n=4, tot=8, dev = [-4,4,-4,4], d0 = 64
    // lag1: -16-16-16 = -48 -> -750000; lag2: 16+16 = 32 -> 500000
    // lag3: -16 -> -250000
    val d = series(("s", 1L, 1L), ("s", 2L, 3L), ("s", 3L, 1L), ("s", 4L, 3L))
    val r = TimeSeries.tsAutocorrelation(d).collect()
      .map(x => x.getInt(1) -> x.getLong(3)).toMap
    assert(r == Map(1 -> -750000L, 2 -> 500000L, 3 -> -250000L))
  }

  test("constant series: d0 = 0 guard yields acf 0; short series drops high lags") {
    // n = 2 -> only lag 1 has an overlapping pair; lags 2, 3 absent
    val d = series(("c", 1L, 7L), ("c", 2L, 7L))
    val r = TimeSeries.tsAutocorrelation(d).collect()
    assert(r.length == 1)
    assert(r(0).getInt(1) == 1 && r(0).getLong(3) == 0L)
  }

  test("two-point ramp and segment independence") {
    // [0,2]: dev = [-2,2], d0 = 8, lag1 = -4 -> -500000
    val d = series(("r", 1L, 0L), ("r", 2L, 2L),
      ("s", 1L, 1L), ("s", 2L, 3L), ("s", 3L, 1L), ("s", 4L, 3L))
    val byKey = TimeSeries.tsAutocorrelation(d).collect()
      .map(x => (x.getString(0), x.getInt(1)) -> x.getLong(3)).toMap
    assert(byKey(("r", 1)) == -500000L)
    assert(byKey(("s", 1)) == -750000L, "other segment unaffected")
    assert(!byKey.contains(("r", 2)), "lag >= n absent")
  }

  test("maxLag knob bounds the emitted lags") {
    val d = series(("s", 1L, 1L), ("s", 2L, 3L), ("s", 3L, 1L), ("s", 4L, 3L))
    val lags = TimeSeries.tsAutocorrelation(d, maxLag = 1).collect().map(_.getInt(1))
    assert(lags.toSeq == Seq(1))
  }
}
