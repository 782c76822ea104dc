package graft.operators

import graft.SparkSpec

/** cohort_ltv: cohorting, the offset grid, exact-cents accumulation and
  * the per-user cumulative pinned by hand. Cross-engine exactness is the
  * DuckDB oracle's job at sf0.01.
  */
class CohortLtvSpec extends SparkSpec {

  private def orders(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("cust", "m", "p")
      .selectExpr("cust", "m", "CAST(p AS DECIMAL(18,2)) AS price")
  }

  test("the matrix replays the hand computation") {
    // cohort 100: custs 1,2 (first order month 100); cohort 101: cust 3
    val got = Extras.cohortLtv(orders(
      (1L, 100L, "10.00"), (1L, 101L, "5.50"),
      (2L, 100L, "2.25"), (2L, 102L, "1.00"),
      (3L, 101L, "7.00"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (100L, 0L, 2L, 1225L, 1225L, 612L), // 12.25; per-user 6.125 -> 612 trunc
      (100L, 1L, 2L, 550L, 1775L, 887L),
      (100L, 2L, 2L, 100L, 1875L, 937L),
      (101L, 0L, 1L, 700L, 700L, 700L)))
  }

  test("offsets with no revenue are absent, not zero-filled; cents stay exact") {
    val got = Extras.cohortLtv(orders(
      (1L, 50L, "0.01"), (1L, 53L, "0.02"))).collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(0L, 3L), "gap months are absent")
    assert(got.map(_.getLong(4)).toSeq == Seq(1L, 3L), "penny-exact cumulative")
  }

  test("a customer's later cheaper month never changes their cohort") {
    val got = Extras.cohortLtv(orders(
      (7L, 200L, "1.00"), (7L, 199L, "100.00"))).collect()
    assert(got.forall(_.getLong(0) == 199L), "cohort = MIN month, not first row order")
    assert(got.map(r => (r.getLong(1), r.getLong(3))).toSeq ==
      Seq((0L, 10000L), (1L, 100L)))
  }
}
