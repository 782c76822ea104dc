package graft.operators

import graft.SparkSpec

/** pmi_collocations: the staged lift arithmetic pinned on a hand corpus —
  * lift_ppm = ((c12·N·10⁶) div (c1·c2)) · N div M — plus the min-count
  * prune and the top-k bound. Cross-engine exactness is the DuckDB
  * oracle's job at sf0.01.
  */
class PmiSpec extends SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("hand-computed lift on a two-doc corpus") {
    // tokens: [a b a b] + [a b c] -> N = 7, M = 5
    // pairs: "a b" x3, "b a" x1, "b c" x1; minCount 2 keeps only "a b"
    // c_a = 3, c_b = 3
    // lift = ((3*7*1e6) div 9) * 7 div 5
    //      = (21000000 div 9 = 2333333) * 7 = 16333331 div 5 = 3266666
    val r = CorpusOps.pmiCollocations(docs("a b a b", "a b c"), minCount = 2)
      .collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getString(0) == "a" && row.getString(1) == "b")
    assert(row.getLong(2) == 3L, "c12")
    assert(row.getLong(3) == 3L, "c1")
    assert(row.getLong(4) == 3L, "c2")
    assert(row.getLong(5) == 3266666L, "staged lift_ppm")
  }

  test("lift ranks the exclusive pair above the frequent-but-promiscuous one") {
    // "x y" always together (3 of 3 occurrences of each); "of the" also
    // co-occurs 3 times but 'of' and 'the' appear 6 times each — raw
    // count ties the pairs, lift must rank (x, y) first.
    // N = 27, M = 25; lift(x y) = ((3*27e6) div 9)*27 div 25 = 9720000;
    // lift(of the) = ((81e6 div 36) = 2250000)*27 div 25 = 2430000.
    val d = docs(
      "x y c1 of the c2 of the c3 x y c4 of the c5 x y of c6 the",
      "of d1 the d2 of d3 the")
    val r = CorpusOps.pmiCollocations(d, minCount = 3).collect()
    assert(r.length == 2, "exactly the two count-3 pairs survive")
    assert(r(0).getString(0) == "x" && r(0).getString(1) == "y",
      "the exclusive pair ranks first by lift")
    assert(r(0).getLong(5) == 9720000L)
    assert(r(1).getString(0) == "of" && r(1).getString(1) == "the")
    assert(r(1).getLong(5) == 2430000L)
  }

  test("minCount prunes and topK bounds the output") {
    val d = docs("p q p q p q", "r s")
    assert(CorpusOps.pmiCollocations(d, minCount = 4).isEmpty,
      "no pair reaches count 4")
    val top1 = CorpusOps.pmiCollocations(d, minCount = 1, topK = 1).collect()
    assert(top1.length == 1)
  }

  test("null/empty text contributes nothing") {
    import spark.implicits._
    val d = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "m n m n"))
      .toDF("doc_id", "text")
    val r = CorpusOps.pmiCollocations(d, minCount = 2).collect()
    // N = 4, M = 3; "m n" c12=2, c_m=2, c_n=2
    // lift = ((2*4*1e6) div 4 = 2000000) * 4 div 3 = 2666666
    assert(r.length == 1 && r(0).getLong(5) == 2666666L)
  }
}
