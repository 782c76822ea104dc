package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Hand-computed golden vectors for the page-graph family over a 4-node
  * graph small enough to verify on paper.
  *
  * Click paths (user: page sequence) and the directed edges they mint:
  *   u10: 1 -> 2 -> 3   edges (1,2) (2,3)
  *   u11: 1 -> 3        edge  (1,3)
  *   u12: 2 -> 4        edge  (2,4)
  *   u13: 3 -> 1        edge  (3,1)
  * Undirected: {1,2} {1,3}(w2) {2,3} {2,4} — one triangle {1,2,3},
  * node 4 hangs off 2.
  */
class GraphGoldenSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(): String = {
    val dir = tmpDir("graphgold")
    def ev(id: Long, user: Long, sec: Int, k: Int) =
      (id, Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d"), user, "pv", 1.0, s"""{"k": $k}""")
    val rows = Seq(
      ev(1, 10, 1, 1), ev(2, 10, 2, 2), ev(3, 10, 3, 3),
      ev(4, 11, 1, 1), ev(5, 11, 2, 3),
      ev(6, 12, 1, 2), ev(7, 12, 2, 4),
      ev(8, 13, 1, 3), ev(9, 13, 2, 1))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("triangle_count: exactly the {1,2,3} triangle, once per member") {
    val dir = fixture()
    val out = graft.SparkEntry.queries("triangle_count")(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 1L)),
      s"nodes 1-3 in one triangle, node 4 in none, got $out")
  }

  test("graph_degree_stats: directed degrees and strengths match the paths") {
    val dir = fixture()
    val out = graft.SparkEntry.queries("graph_degree_stats")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, 1L, 1L), // out {2,3}, in {3}
      (2L, 2L, 2L, 1L, 1L), // out {3,4}, in {1}
      (3L, 1L, 1L, 2L, 2L), // out {1},   in {1,2}
      (4L, 0L, 0L, 1L, 1L)), // sink
      s"got $out")
  }

  test("graph_bfs_levels: 1 -> {2,3} -> {4}") {
    val dir = fixture()
    val out = graft.SparkEntry.queries("graph_bfs_levels")(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L)), s"got $out")
  }

  test("graph_jaccard_neighbors: the two unconnected pairs score 1/2") {
    val dir = fixture()
    val out = graft.SparkEntry.queries("graph_jaccard_neighbors")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // N(1)={2,3}, N(3)={1,2}, N(4)={2}; unconnected: (1,4) and (3,4),
    // each sharing the single middle 2 -> 1/(deg+1-1) = 0.5
    assert(out == Seq((1L, 4L, 1L, 0.5), (3L, 4L, 1L, 0.5)), s"got $out")
  }

  test("graph_communities: two synchronous weighted-LPA rounds, ties to smallest label") {
    val dir = fixture()
    val out = graft.SparkEntry.queries("graph_communities")(spark, dir)
      .as[(Long, Long)].collect().toSeq
    // weights: {1,3} carries w2 (both directions), all else w1.
    // round 1: 1 adopts 3 (w2 beats w1); 2 ties {1,3,4} -> 1; 3 adopts 1
    //          (w2); 4 adopts 2.
    // round 2: 1 sees lbl1 from both nbrs -> 1; 2 ties {3,1,2} -> 1;
    //          3 sees {3:w2, 1:w1} -> 3; 4 sees lbl1 -> 1.
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 1L)), s"got $out")
  }
}
