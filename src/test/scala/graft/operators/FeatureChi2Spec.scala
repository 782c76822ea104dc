package graft.operators

import graft.SparkSpec
import graft.functions.Portable.{MIX, P}

/** feature_chi2: the per-bucket 2×2 replayed via BigInt staging in plain
  * Scala, the discriminative-vs-balanced ranking, topK/tie-break and
  * loud guards. Cross-engine exactness is the DuckDB oracle's job at
  * sf0.01.
  */
class FeatureChi2Spec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  /** Plain-Scala bucket of a bigram, sharing no code with the operator. */
  private def bkt(a: String, b: String): Long = {
    def h(t: String) = t.foldLeft(0L)((x, c) => (x * 31 + c.toLong) % P)
    ((h(a) * MIX + h(b)) % P) % 8192
  }

  /** BigInt replay of the staged chi-square (the AbTestSpec discipline). */
  private def chi2Milli(nA: Long, cA: Long, nB: Long, cB: Long): Long = {
    if (nA == 0 || nB == 0 || cA + cB == 0 || nA - cA + nB - cB == 0) return 0L
    val dd = BigInt(cA) * (nB - cB) - BigInt(cB) * (nA - cA)
    (((dd * dd / (BigInt(nA) * nB)) * 1000 * (nA + nB)) /
      (BigInt(cA + cB) * (nA - cA + nB - cB))).toLong
  }

  test("per-bucket counts, margins and the staged chi-square replay by hand") {
    // pos docs repeat "aa bb"; neg docs repeat "cc dd"; one shared "ee ff"
    val d = docs(
      (1L, "en", "aa bb aa bb ee ff"), (2L, "en", "aa bb ee ff"),
      (3L, "de", "cc dd cc dd ee ff"), (4L, "de", "cc dd ee ff"))
    val got = CorpusOps.featureChi2(d, "lang = 'en'", topK = 8192)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    // margins: per doc, bigrams = tokens-1 (all windows), counted as
    // OCCURRENCES: pos bigrams n_a, neg n_b
    val nA = 5L + 3L
    val nB = 5L + 3L
    val kAab = bkt("aa", "bb"); val kEef = bkt("ee", "ff")
    // 'aa bb': pos occurrences 2+1=3 ('aa bb','bb aa','aa bb' -> the
    // bigram (aa,bb) occurs at positions 1,3 in doc1 and 1 in doc2)
    assert(got(kAab)._1 == 3L && got(kAab)._2 == 0L)
    assert(got(kAab)._3 == chi2Milli(nA, 3L, nB, 0L), "pure-pos feature")
    assert(got(kEef)._1 == 2L && got(kEef)._2 == 2L)
    assert(got(kEef)._3 == chi2Milli(nA, 2L, nB, 2L) && got(kEef)._3 == 0L,
      "a perfectly balanced feature scores exactly zero")
    assert(got(kAab)._3 > got(bkt("bb", "ee"))._3,
      "class-pure features outrank incidental ones")
  }

  test("topK bounds the report; ties break by bucket id ascending") {
    val d = docs((1L, "en", "aa bb"), (2L, "de", "cc dd"))
    val all = CorpusOps.featureChi2(d, "lang = 'en'", topK = 100).collect()
    assert(all.length == 2, "two buckets exist")
    // both are single-occurrence pure features -> equal chi2; bkt ASC
    assert(all(0).getLong(3) == all(1).getLong(3))
    assert(all(0).getLong(0) < all(1).getLong(0))
    val one = CorpusOps.featureChi2(d, "lang = 'en'", topK = 1).collect()
    assert(one.length == 1 && one(0).getLong(0) == all(0).getLong(0))
  }

  test("significance rides the shared critMilli knob") {
    // 40 pure-pos vs 40 pure-neg occurrences: chi2 = N = 80000 milli
    val d = docs(
      (1L, "en", Seq.fill(41)("aa").mkString(" ")),
      (2L, "de", Seq.fill(41)("cc").mkString(" ")))
    val got = CorpusOps.featureChi2(d, "lang = 'en'").collect()
    assert(got.forall(_.getInt(4) == 1), "N=80 pure separation clears 3.841")
    val strict = CorpusOps.featureChi2(d, "lang = 'en'", critMilli = 100000L)
      .collect()
    assert(strict.forall(_.getInt(4) == 0))
  }

  test("guards are loud") {
    intercept[IllegalArgumentException](
      CorpusOps.featureChi2(docs((1L, "en", "a b")), "lang = 'en'", topK = 0))
    intercept[IllegalArgumentException](
      CorpusOps.featureChi2(docs((1L, "en", "a b")), "lang = 'en'",
        critMilli = -1L))
  }
}
