package graft.operators

import graft.SparkSpec

/** langid_eval: confusion-matrix invariants over the sf0.001 fixture —
  * rows partition the truth counts, row_pm is row-normalized recall,
  * and the prediction matches text_lang_id's argmax doc-for-doc (one
  * definition). Cross-engine exactness is the DuckDB oracle's job at
  * sf0.01.
  */
class LangidEvalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("confusion rows partition each truth count; row_pm is row recall") {
    val rows = graft.SparkEntry.queries("langid_eval")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byTruth = rows.groupBy(_.getString(0))
    byTruth.foreach { case (_, rs) =>
      val nTrue = rs.head.getLong(3)
      assert(rs.map(_.getLong(2)).sum == nTrue,
        "per-truth confusion counts must sum to n_true")
      rs.foreach { r =>
        assert(r.getLong(4) == r.getLong(2) * 1000L / nTrue, "row_pm")
        assert(Set("en", "es", "de", "fr").contains(r.getString(1)))
      }
    }
  }

  test("the diagonal agrees with text_lang_id's per-doc argmax") {
    val eval = graft.SparkEntry.queries("langid_eval")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val perDoc = graft.SparkEntry.queries("text_lang_id")(spark, dir).collect()
      .groupBy(r => (r.getString(1), r.getString(2)))
      .map { case (k, v) => k -> v.length.toLong }
    assert(eval == perDoc,
      "the confusion matrix is exactly the per-doc prediction histogram")
  }
}
