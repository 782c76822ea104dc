package graft.operators

import graft.SparkSpec

/** graph_assortativity: Newman's mixing coefficient pinned by hand on
  * canonical graphs (the star's exact −1, a computed mixed case, the
  * regular-graph zero-denominator contract, and the sign decomposition).
  * Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class AssortativitySpec extends SparkSpec {

  private def edges(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("a", "b")
  }

  test("a star is exactly -1 (perfect disassortativity)") {
    val r = Graph.assortativity(edges((9L, 1L), (9L, 2L), (9L, 3L))).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 3L, -1000000L)))
  }

  test("a triangle with a pendant replays the hand Pearson") {
    // degs a=3 b=2 c=2 d=1; M=8, Sx=18, Sxx=44, Sxy=38
    // num = 304-324 = -20; den = 352-324 = 28 -> -714285 ppm (trunc)
    val r = Graph.assortativity(edges(
      (1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((4L, 4L)))
    assert(r.getLong(2) == -714285L, s"got ${r.getLong(2)}")
  }

  test("a regular graph has zero variance: the contract value is 0") {
    // 4-cycle: every degree 2 -> den = 0
    val r = Graph.assortativity(edges(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).collect()(0)
    assert(r.getLong(2) == 0L)
  }

  test("assortative topology reads positive") {
    // two K3 hubs bridged by their own edge, plus two pendants on ONE
    // far node: high-degree nodes mostly link high-degree nodes
    val r = Graph.assortativity(edges(
      (1L, 2L), (1L, 3L), (2L, 3L),      // K3
      (4L, 5L), (4L, 6L), (5L, 6L),      // K3
      (1L, 4L),                           // hub-hub bridge
      (7L, 8L))).collect()(0)             // an isolated deg-1 pair
    assert(r.getLong(2) > 0L, s"hub-hub linking must read positive, got ${r.getLong(2)}")
  }
}
