package graft.operators

import graft.SparkSpec

/** graph_kcore: the bounded-round peeling semantics pinned on hand-built
  * graphs — a pendant chain cascades over multiple rounds, a clique and a
  * ring are fixpoints, and the round budget is the documented contract
  * (result after `rounds` peels; equals the true k-core at convergence).
  * Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class KcoreSpec extends SparkSpec {

  private def und(es: (Long, Long)*) = {
    import spark.implicits._
    es.toDF("a", "b")
  }

  private def run(k: Int, rounds: Int, es: (Long, Long)*): Map[Long, Long] =
    Graph.kcore(und(es: _*), k, rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  // 4-clique {1,2,3,4} with a pendant chain 4-5-6
  private val cliqueChain = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L))

  test("pendant chain cascades: node 6 peels in round 1, node 5 only in round 2") {
    val after1 = run(2, 1, cliqueChain: _*)
    assert(after1.contains(5L) && !after1.contains(6L),
      "after one round only the degree-1 tip is gone; 5 survives (it still had degree 2)")
    val after2 = run(2, 2, cliqueChain: _*)
    assert(after2.keySet == Set(1L, 2L, 3L, 4L),
      "round 2 peels node 5, whose degree DROPPED to 1 when 6 left")
    assert(after2.values.toSet == Set(3L),
      "the surviving 2-core is the clique; degrees are within the survivors (4's edge to 5 is gone)")
  }

  test("converged result is a fixpoint: extra rounds change nothing") {
    assert(run(2, 2, cliqueChain: _*) == run(2, 5, cliqueChain: _*))
  }

  test("a ring is its own 2-core; a triangle has no 3-core") {
    val ring = run(2, 3, (1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    assert(ring == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
    assert(run(3, 3, (1L, 2L), (2L, 3L), (1L, 3L)).isEmpty,
      "every triangle node has degree 2 < 3: all peel in round 1")
  }
}
