package graft.operators

import graft.SparkSpec

/** rfm_segments: the three-dimension quintile scoring pinned by hand —
  * cutoff placement, the recency inversion, the equal-value tie rule, the
  * monetary quantization knob and the bucket-count knob. Cross-engine
  * exactness is the DuckDB oracle's job at sf0.01.
  */
class RfmSpec extends SparkSpec {

  private val day = 86400000000L

  private def orders(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("cust", "d", "p")
      .selectExpr("cust", "d * 86400000000 AS ts_us", "CAST(p AS DECIMAL(18,2)) AS price")
  }

  test("scores replay the hand computation; recency inverts") {
    // 10 customers: cust i ordered once on day i spending (i*10).00
    // recency of cust i = 10 - i; ascending-quintile cut values for both
    // dims split {0..9}/{10..100} into pairs; frequency all 1 -> f = 1
    val rows = (1L to 10L).map(i => (i, i, s"${i * 10}"))
    val got = Extras.rfmSegments(orders(rows: _*)).collect()
    val byCust = got.map(r => r.getLong(0) ->
      (r.getLong(1), r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7))).toMap
    // cust 10: recency 0 -> r_bucket 1 -> r_score 5; monetary 100.00 top -> m 5
    assert(byCust(10L) == ((0L, 5, 1, 5, 515)))
    // cust 1: recency 9 -> bucket 5 -> score 1; monetary bottom -> 1
    assert(byCust(1L) == ((9L, 1, 1, 1, 111)))
    // cust 5: recency 5 -> third pair -> r_score 3; m_score 3
    assert(byCust(5L) == ((5L, 3, 1, 3, 313)))
    assert(got.forall(_.getInt(5) == 1), "all frequencies equal -> one bucket, score 1")
  }

  test("frequency counts orders; monetary sums exact cents") {
    val rows = Seq((1L, 1L, "10.25"), (1L, 3L, "0.75"), (2L, 3L, "5.00"))
    val got = Extras.rfmSegments(orders(rows: _*)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((0L, 2L, 1100L)), "last day 3; 2 orders; 1025 + 75 cents")
    assert(got(2L) == ((0L, 1L, 500L)))
  }

  test("equal values share a bucket (the tie rule)") {
    // 4 customers with identical everything + 1 whale
    val rows = (1L to 4L).map(i => (i, 5L, "20")) :+ ((9L, 5L, "900"))
    val got = Extras.rfmSegments(orders(rows: _*)).collect()
    val m = got.map(r => r.getLong(0) -> r.getInt(6)).toMap
    assert(Set(1L, 2L, 3L, 4L).map(m) == Set(1), "the tied four share m bucket 1")
    assert(m(9L) == 5, "the whale lands in the top bucket")
  }

  test("monetaryUnit quantizes the bucketing domain, not the output") {
    // cents 1001 vs 1099 tie under unit 100 (both m_unit 10) but differ raw
    val rows = Seq((1L, 1L, "10.01"), (2L, 1L, "10.99"), (3L, 1L, "99.00"))
    val got = Extras.rfmSegments(orders(rows: _*), monetaryUnit = 100L).collect()
    val m = got.map(r => r.getLong(0) -> (r.getLong(3), r.getInt(6))).toMap
    assert(m(1L)._2 == m(2L)._2, "quantized equal -> same bucket")
    assert(m(1L)._1 == 1001L && m(2L)._1 == 1099L, "raw cents survive in the output")
    assert(m(3L)._2 > m(1L)._2)
  }

  test("the buckets knob rescales scores and the guards are loud") {
    val rows = (1L to 8L).map(i => (i, i, s"${i * 10}"))
    val got = Extras.rfmSegments(orders(rows: _*), buckets = 2).collect()
    assert(got.map(_.getInt(6)).toSet == Set(1, 2), "two monetary buckets")
    intercept[IllegalArgumentException](Extras.rfmSegments(orders(rows: _*), buckets = 1))
    intercept[IllegalArgumentException](
      Extras.rfmSegments(orders(rows: _*), monetaryUnit = 0L))
  }
}
