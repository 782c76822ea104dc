package graft.operators

import graft.SparkSpec
import graft.functions.Portable.{MIX, P}

/** weighted_sample: the integer E–S-surrogate priority replayed in plain
  * Scala — ordering, the per-source k bound, the weight monotonicity and
  * the zero-weight exclusion. Cross-engine exactness is the DuckDB
  * oracle's job at sf0.01.
  */
class WeightedSampleSpec extends SparkSpec {

  private def priority(docId: Long, w: Long): Long =
    (((docId % 999983L) * MIX + 17L) % P) * 1000000L / w

  private def docs(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "n_chars")
  }

  test("ranks replay the scalar priority formula exactly") {
    val rows = (1L to 30L).map(i => (i, "s", 10L + i))
    val got = Curation.weightedSample(docs(rows: _*), k = 5).collect()
    val expect = rows.map { case (id, _, w) => (id, priority(id, w)) }
      .sortBy { case (id, p) => (p, id) }.take(5)
    assert(got.map(r => (r.getLong(1), r.getLong(3))).toSeq == expect)
    assert(got.map(_.getInt(2)).toSeq == (1 to 5), "dense ranks")
  }

  test("a dominant weight forces inclusion (weight monotonicity)") {
    // the heavy doc's priority is h*1e6 div 1e9 <= 1000, below any
    // weight-1 doc's priority (h*1e6 with h >= 17)
    val rows = (1L to 20L).map(i => (i, "s", 1L)) :+ (99L, "s", 1000000000L)
    val got = Curation.weightedSample(docs(rows: _*), k = 3).collect()
    assert(got.map(_.getLong(1)).contains(99L))
    assert(got(0).getLong(1) == 99L, "the heavy doc ranks first")
  }

  test("k bounds each source independently; zero weights are excluded") {
    val rows = (1L to 10L).map(i => (i, "a", 5L)) ++
      (11L to 20L).map(i => (i, "b", 5L)) :+ (21L, "a", 0L)
    val got = Curation.weightedSample(docs(rows: _*), k = 4).collect()
    val bySrc = got.groupBy(_.getString(0))
    assert(bySrc("a").length == 4 && bySrc("b").length == 4)
    assert(!got.map(_.getLong(1)).contains(21L), "weight 0 never sampled")
  }
}
