package graft.operators

import graft.SparkSpec

/** gini_concentration: the rank-formulation Gini pinned on hand cases —
  * uniform zero, the (n−1)/n single-earner extreme, a computed mixed
  * case and tie invariance. Cross-engine exactness is the DuckDB
  * oracle's job at sf0.01.
  */
class GiniSpec extends SparkSpec {

  private def sales(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("item", "p").selectExpr("item", "CAST(p AS DECIMAL(18,2)) AS price")
  }

  test("uniform revenues read zero; a single earner reads (n-1)/n") {
    val flat = Extras.giniConcentration(
      sales((1L, "5"), (2L, "5"), (3L, "5"), (4L, "5"))).collect()(0)
    assert((flat.getLong(0), flat.getLong(1), flat.getLong(2)) == ((4L, 2000L, 0L)))
    // items 1..4, only item 9 earns: G = (4-1)/4 = 0.75
    val mono = Extras.giniConcentration(
      sales((9L, "100"), (2L, "0"), (3L, "0"), (4L, "0"))).collect()(0)
    assert(mono.getLong(2) == 750000L)
  }

  test("a 1:3 split replays the hand formula") {
    // ascending x = (1, 3): G = (2*(1+6) - 3*4) / (2*4) = 0.25
    val r = Extras.giniConcentration(sales((1L, "0.01"), (2L, "0.03"))).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 4L, 250000L)))
  }

  test("equal-revenue rank ties never move the coefficient") {
    // two equal items + one heavy: whichever of the equals ranks first,
    // sum(i*x) over the tied pair is the same
    val a = Extras.giniConcentration(sales((1L, "2"), (2L, "2"), (3L, "8"))).collect()(0)
    val b = Extras.giniConcentration(sales((2L, "2"), (1L, "2"), (3L, "8"))).collect()(0)
    assert(a.getLong(2) == b.getLong(2))
    // hand: x=(200,200,800), sum=1200, six=200+400+2400=3000
    // G = (6000 - 4*1200)/(3*1200) = 1200/3600 -> 333333 ppm
    assert(a.getLong(2) == 333333L)
  }

  test("line rows aggregate per item before ranking") {
    val r = Extras.giniConcentration(
      sales((1L, "3"), (1L, "2"), (2L, "5"))).collect()(0)
    assert((r.getLong(0), r.getLong(2)) == ((2L, 0L)), "5 vs 5 after the per-item sum")
  }
}
