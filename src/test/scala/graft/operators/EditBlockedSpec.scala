package graft.operators

import graft.SparkSpec

/** dedup_edit_blocked: blocking recall/precision semantics pinned on
  * hand pairs — the Levenshtein verify, the length prune's soundness,
  * the first-token blocking miss (documented tradeoff) and the df-cap
  * hub tier. Cross-engine exactness is the DuckDB oracle's job at
  * sf0.01.
  */
class EditBlockedSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  test("a one-edit pair in the same block verifies with exact distance") {
    val d = docs(
      (1L, "en", "hello world aaa"),
      (2L, "en", "hello world aab"))
    val r = Dedup.editBlockedPairs(d).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 1L && r(0).getLong(1) == 2L)
    assert(r(0).getLong(2) == 1L, "levenshtein distance")
    // sim_pm = (15 - 1) * 1000 div 15 = 933
    assert(r(0).getLong(3) == 933L)
  }

  test("a different first token blocks the pair away (the documented miss)") {
    val d = docs(
      (1L, "en", "hello world aaa"),
      (3L, "en", "xello world aaa"))
    assert(Dedup.editBlockedPairs(d).isEmpty,
      "dist 1 but never a candidate: first-token blocking tradeoff")
  }

  test("the length prune drops pairs the similarity floor could never pass") {
    // len 100 vs 79 share band 1 (via the +50 band) but
    // |100-79|*1000 = 21000 > 200*100 -> pruned before any DP
    val a = "tok " + ("a" * 96)
    val b = "tok " + ("b" * 75)
    assert(a.length == 100 && b.length == 79)
    val d = docs((1L, "en", a), (2L, "en", b))
    assert(Dedup.editBlockedPairs(d).isEmpty)
  }

  test("langs never cross-pair") {
    val d = docs(
      (1L, "en", "same text here"),
      (2L, "fr", "same text here"))
    assert(Dedup.editBlockedPairs(d).isEmpty)
  }

  test("df above the cap switches to hub pairing") {
    val d = docs(
      (10L, "en", "dup text body"),
      (11L, "en", "dup text body"),
      (12L, "en", "dup text body"),
      (13L, "en", "dup text body"))
    val r = Dedup.editBlockedPairs(d, dfCap = 2).collect()
    // block df = 4 > 2 -> each member pairs with the min doc_id only
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSet ==
      Set((10L, 11L), (10L, 12L), (10L, 13L)))
    assert(r.forall(x => x.getLong(2) == 0L && x.getLong(3) == 1000L))
  }

  test("null text and token-free docs are absent, not errors") {
    val d = docs(
      (1L, "en", null),
      (2L, "en", "???!!!"),
      (3L, "en", "real text body a"),
      (4L, "en", "real text body b"))
    val r = Dedup.editBlockedPairs(d).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq == Seq((3L, 4L)))
  }
}
