package graft.operators

import graft.SparkSpec

/** ndcg_eval: the discount constants pinned against the law, perfect /
  * reversed / partial rankings by hand, the rel-tie invariance, the
  * no-relevant guard and the k knob. Cross-engine exactness is the
  * DuckDB oracle's job at sf0.01.
  */
class NdcgSpec extends SparkSpec {

  private def frame(rows: (String, Int, Long)*) = {
    import spark.implicits._
    rows.toDF("qid", "rank", "rel")
  }

  private def ndcg(k: Int, rows: (String, Int, Long)*): Map[String, (Long, Long, Long)] =
    Retrieval.ndcgAt(frame(rows: _*), k).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("the ppm discounts ARE 1/log2(rank+1): within 1 ppm") {
    Retrieval.ndcgDiscPpm.zipWithIndex.foreach { case (ppm, i) =>
      val exact = 1e6 / (math.log(i + 2) / math.log(2))
      assert(math.abs(ppm - exact) <= 1.0, s"rank ${i + 1}: $ppm vs $exact")
    }
  }

  test("a ranking already in relevance order is NDCG = 1 exactly") {
    val got = ndcg(10, ("q", 1, 3L), ("q", 2, 2L), ("q", 3, 1L), ("q", 4, 0L))
    assert(got("q")._3 == 1000000L)
    // rel ties permute freely without moving the score
    val tied = ndcg(10, ("q", 1, 2L), ("q", 2, 2L), ("q", 3, 2L))
    assert(tied("q")._3 == 1000000L)
  }

  test("the worst ordering of the same grades replays by hand") {
    // grades {3, 0} reversed: dcg = 0*disc(1) + 3*disc(2) = 1892790;
    // idcg = 3*disc(1) = 3000000 -> ndcg = 630930 (= disc(2) in ppm)
    val got = ndcg(10, ("q", 1, 0L), ("q", 2, 3L))
    assert(got("q") == ((1892790L, 3000000L, 630930L)))
  }

  test("no relevant docs retrieved reads the guard, never a division error") {
    val got = ndcg(10, ("q", 1, 0L), ("q", 2, 0L))
    assert(got("q") == ((0L, 0L, 0L)))
  }

  test("k truncates both the ranking and the ideal; knob guards are loud") {
    // at k = 1 only rank 1 counts: dcg = 1*disc(1), ideal re-ranks the
    // SURVIVING rows only (rank <= k filter happens first)
    val got = ndcg(1, ("q", 1, 1L), ("q", 2, 3L))
    assert(got("q") == ((1000000L, 1000000L, 1000000L)),
      "the rank-2 grade-3 doc is outside the k = 1 window for both sides")
    intercept[IllegalArgumentException](Retrieval.ndcgAt(frame(("q", 1, 1L)), 0))
    intercept[IllegalArgumentException](Retrieval.ndcgAt(frame(("q", 1, 1L)), 21))
    intercept[IllegalArgumentException](
      Retrieval.ndcgAt(frame(("q", 1, 1L)).select("qid", "rank"), 5))
  }

  test("multiple queries stay independent; a swap replays by hand") {
    // q1 perfect {2,1}; q2 swapped {1,2}:
    // q2 dcg = 1*1e6 + 2*630930 = 2261860; idcg = 2*1e6 + 1*630930 = 2630930
    val got = ndcg(10, ("q1", 1, 2L), ("q1", 2, 1L), ("q2", 1, 1L), ("q2", 2, 2L))
    assert(got("q1")._3 == 1000000L)
    assert(got("q2") == ((2261860L, 2630930L, 859718L)))
  }
}
