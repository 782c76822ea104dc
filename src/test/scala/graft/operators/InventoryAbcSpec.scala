package graft.operators

import graft.SparkSpec

/** inventory_abc: the Pareto classing, the crosses-stay-rich boundary
  * rule, ties, and the knobs pinned by hand. Cross-engine exactness is
  * the DuckDB oracle's job at sf0.01.
  */
class InventoryAbcSpec extends SparkSpec {

  private def sales(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("item", "p").selectExpr("item", "CAST(p AS DECIMAL(18,2)) AS price")
  }

  test("classes replay the hand computation with the boundary rule") {
    // revenues: 70, 15, 10, 5 (total 100); cum-before: 0, 700, 850, 950
    val got = Extras.inventoryAbc(sales(
      (1L, "70"), (2L, "15"), (3L, "10"), (4L, "5"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 7000L, 700L, "A"),
      (2L, 1500L, 850L, "A"),  // starts at 700 < 800: A despite ending at 850
      (3L, 1000L, 950L, "B"),  // starts at 850
      (4L, 500L, 1000L, "C"))) // starts at 950
  }

  test("the boundary crosser keeps the richer class; one item is all A") {
    // 85 then 15: item 2 STARTS at 850 -> B even though it ends at 1000
    val two = Extras.inventoryAbc(sales((1L, "85"), (2L, "15"))).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(two.toSeq == Seq((1L, "A"), (2L, "B")),
      "item 1 crosses 800 but started at 0 -> A")
    val one = Extras.inventoryAbc(sales((9L, "3.33"))).collect()
    assert(one(0).getString(3) == "A" && one(0).getLong(2) == 1000L)
  }

  test("revenue ties break by item id; per-item sums aggregate line rows") {
    val got = Extras.inventoryAbc(sales(
      (5L, "10"), (5L, "10"), (3L, "20"), (1L, "1"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    // 3 and 5 tie at 2000 cents; 3 ranks first by id; 5 starts at 487pm -> A
    assert(got.toSeq == Seq((1L, 100L, "C"), (3L, 2000L, "A"), (5L, 2000L, "A")))
  }

  test("the boundaries are knobs and bad knobs are loud") {
    val s = sales((1L, "50"), (2L, "30"), (3L, "20"))
    val strict = Extras.inventoryAbc(s, aPm = 400L, bPm = 600L).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(strict.toSeq == Seq((1L, "A"), (2L, "B"), (3L, "C")))
    intercept[IllegalArgumentException](Extras.inventoryAbc(s, aPm = 950L, bPm = 900L))
    intercept[IllegalArgumentException](Extras.inventoryAbc(s, aPm = 0L))
  }
}
