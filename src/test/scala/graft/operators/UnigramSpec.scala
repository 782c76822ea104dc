package graft.operators

import graft.SparkSpec

/** Pins the unigram-LM tokenizer's EM-prune round by hand: seed counts,
  * the top-K seed selection, one greedy hard-EM segmentation pass, the
  * usage-ranked prune, and the greedy char fallback for words the pruned
  * vocabulary no longer covers whole. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // corpus: abab x3, ab x2, b x5, ba x1 (maxLen 2, seedMulti 2, 1 round)
  // seed counts: a 9, b 14, ab 8, ba 4 -> v0 = chars {a,b} + top-2 {ab,ba}
  // round-1 greedy: abab=[ab,ab], ab=[ab], b=[b], ba=[ba]
  //   usage: ab 8, b 5, ba 1 -> keep = 2 >> 1 = 1 multi -> v1 = {a,b,ab}
  // final seg: abab=[ab,ab], ab=[ab], b=[b], ba=[b,a] (char fallback)
  //   usage: ab 8, b 6, a 1 ('a' only reachable as fallback now)
  private def words = Seq(
    ("abab", 3L), ("ab", 2L), ("b", 5L), ("ba", 1L)).toDF("word", "cnt")

  test("one EM round matches the hand computation exactly") {
    val (pieces, seg) = Tokenizer.unigramTrain(
      words, maxLen = 2, seedMulti = 2, rounds = 1)
    val got = pieces.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(("a", 1, 1L), ("ab", 2, 8L), ("b", 1, 6L)))
    val enc = seg.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(enc == Map(
      "abab" -> List("ab", "ab"), "ab" -> List("ab"),
      "b" -> List("b"), "ba" -> List("b", "a")))
  }

  test("single chars survive every prune and keep segmentation total") {
    // prune to 1 multi-char piece over 3 rounds: every word must still
    // segment (no empty encodings), and all 1-char pieces stay eligible
    val (_, seg) = Tokenizer.unigramTrain(
      words, maxLen = 2, seedMulti = 2, rounds = 3)
    val enc = seg.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(enc.values.forall(_.nonEmpty), "greedy must be total")
    assert(enc.values.flatten.forall(p => p.length <= 2))
    // reconstruction: concatenating the pieces gives back the word
    enc.foreach { case (w, ps) => assert(ps.mkString == w) }
  }

  test("deeper vocabulary compresses: unigram pieces never exceed word count") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("tokenizer_unigram_fertility")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nW = r.getAs[Long]("n_words"); val nS = r.getAs[Long]("n_symbols")
      assert(nS >= nW, "a word is at least one piece")
      val fert = r.getAs[Long]("fertility_mille")
      assert(fert >= 1000L && fert < 10000L, s"fertility sane, got $fert")
    }
  }
}
