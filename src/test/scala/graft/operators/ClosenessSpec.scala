package graft.operators

import graft.SparkSpec

/** graph_closeness: distances, the harmonic milli-sum, seed sampling,
  * disconnection and the radius knob on hand graphs. Cross-engine
  * exactness is the DuckDB oracle's job at sf0.01.
  */
class ClosenessSpec extends SparkSpec {

  private def und(edges: (Long, Long)*) = {
    import spark.implicits._
    edges.toDF("a", "b")
  }

  test("path + disconnected pair: distances and reachability by hand") {
    // 0-1-2-3-4-5 and 100-101; seeds (v % 100 == 0) = {0, 100}
    val g = und((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (100L, 101L))
    val got = Graph.harmonicCloseness(g, seedEvery = 100L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // radius 3 from seed 0 reaches 1,2,3; seed 100 reaches 101 only
    assert(got == Map(
      1L -> ((1L, 1000L)), 2L -> ((1L, 500L)), 3L -> ((1L, 333L)),
      101L -> ((1L, 1000L))),
      "nodes 0/4/5/100 absent: seeds don't count themselves, radius caps at 3, components isolate")
  }

  test("all-nodes seeding on a star: center vs leaf harmonic sums") {
    val g = und((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L))
    val got = Graph.harmonicCloseness(g, seedEvery = 1L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == ((5L, 5000L)), "center: five seeds at distance 1")
    (1L to 5L).foreach { v =>
      assert(got(v) == ((5L, 3000L)),
        s"leaf $v: center at 1 (1000) + four leaves at 2 (4 x 500)")
    }
  }

  test("rounds is the radius knob") {
    val g = und((0L, 1L), (1L, 2L), (2L, 3L))
    val r1 = Graph.harmonicCloseness(g, seedEvery = 100L, rounds = 1).collect()
    assert(r1.map(_.getLong(0)).toSeq == Seq(1L), "radius 1 sees only the neighbor")
    val r2 = Graph.harmonicCloseness(g, seedEvery = 100L, rounds = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(r2 == Map(1L -> 1000L, 2L -> 500L))
  }

  test("shortest path wins over longer alternatives (triangle + tail)") {
    // 0-1, 0-2, 1-2, 2-3: d(0,3) = 2 via 2, not 3 via 1-2
    val g = und((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L))
    val got = Graph.harmonicCloseness(g, seedEvery = 100L).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 1000L, 2L -> 1000L, 3L -> 500L),
      "a node already visited at a shorter level never re-enters deeper")
  }

  test("multi-word bitmaps: 70 seeds span two words and the sign bit (star)") {
    // 70 nodes all seeded (seedEvery = 1): dense idx 0..69 packs into
    // TWO 64-bit words (widx 0 holds idx 0..63 including the 1L << 63
    // sign-bit seed, widx 1 holds idx 64..69) — the cross-word grouping,
    // per-word bit_or, visited masking and negative-long word paths the
    // single-word hand graphs never reach
    val g = und((1L to 69L).map(v => (0L, v)): _*)
    val got = Graph.harmonicCloseness(g, seedEvery = 1L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == 70, s"every node reached, got ${got.size}")
    assert(got(0L) == ((69L, 69000L)), "center: 69 seeds at distance 1")
    (1L to 69L).foreach { v =>
      assert(got(v) == ((69L, 35000L)),
        s"leaf $v: center at 1 (1000) + 68 leaves at 2 (68 x 500)")
    }
  }

  test("multi-word bitmaps: distances stay exact across word boundaries (path)") {
    // 0-1-...-69 chain, all seeded: every node's reachable-seed set
    // spans the word boundary for nodes near idx 64, and per-level
    // visited masks must clear EXACTLY the right bit in the right word
    val g = und((0L until 69L).map(v => (v, v + 1L)): _*)
    val got = Graph.harmonicCloseness(g, seedEvery = 1L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == 70)
    // interior node: 2 seeds at each of d=1 (2x1000), d=2 (2x500), d=3 (2x333)
    Seq(3L, 35L, 62L, 63L, 64L, 66L).foreach { v =>
      assert(got(v) == ((6L, 3666L)), s"interior $v: $got(v)")
    }
    // ends and near-ends truncate on one side
    assert(got(0L) == ((3L, 1833L)) && got(69L) == ((3L, 1833L)))
    assert(got(1L) == ((4L, 2833L)) && got(68L) == ((4L, 2833L)))
    assert(got(2L) == ((5L, 3333L)) && got(67L) == ((5L, 3333L)))
  }

  test("guards are loud") {
    val g = und((0L, 1L))
    intercept[IllegalArgumentException](Graph.harmonicCloseness(g, seedEvery = 0L))
    intercept[IllegalArgumentException](Graph.harmonicCloseness(g, rounds = 0))
    intercept[IllegalArgumentException](Graph.harmonicCloseness(g, rounds = 7))
  }
}
