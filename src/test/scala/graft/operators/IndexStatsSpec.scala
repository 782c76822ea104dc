package graft.operators

import graft.SparkSpec

/** ann_index_stats: the balance report replayed by hand, the skew read
  * the operator exists for, the empty-index edge and loud guards.
  * Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class IndexStatsSpec extends SparkSpec {

  private def assign(cells: Seq[Long]) = {
    import spark.implicits._
    cells.zipWithIndex.map { case (c, i) => (i.toLong, c) }.toDF("vec_id", "cell")
  }

  private def report(cells: Seq[Long], k: Int) = {
    val r = Similarity.ivfIndexStats(assign(cells), k).collect()(0)
    def nl(i: Int) = if (r.isNullAt(i)) -1L else r.getLong(i)
    (r.getLong(0), nl(1), r.getLong(2), r.getLong(3), nl(4), nl(5), r.getLong(6))
  }

  test("a balanced index reads imbalance ~1000") {
    // 4 cells x 5 vectors: perfectly balanced
    val got = report((0L to 3L).flatMap(c => Seq.fill(5)(c)), 4)
    assert(got == ((4L, 20L, 4L, 0L, 5L, 5L, 1000L)))
  }

  test("a skewed index reads the latency story recall math hides") {
    // one cell holds 16 of 20: probing 1 of 4 cells can mean 80% of data
    val cells = Seq.fill(16)(0L) ++ Seq(1L, 1L, 2L, 3L)
    val got = report(cells, 4)
    assert(got == ((4L, 20L, 4L, 0L, 1L, 16L, 3200L)),
      "imbalance 3.2 = the max cell is 3.2x the balanced size")
  }

  test("unused cells surface as empty_cells; an empty index reads zeros") {
    assert(report(Seq(0L, 0L, 2L), 8) == ((8L, 3L, 2L, 6L, 1L, 2L, 5333L)))
    assert(report(Seq.empty, 4) == ((4L, -1L, 0L, 4L, -1L, -1L, 0L)),
      "no vectors: nulls for the sizes, imbalance 0 by guard, all cells empty")
  }

  test("guards are loud") {
    intercept[IllegalArgumentException](Similarity.ivfIndexStats(assign(Seq(1L)), 0))
    intercept[IllegalArgumentException](
      Similarity.ivfIndexStats(assign(Seq(1L)).select("vec_id"), 4))
  }
}
