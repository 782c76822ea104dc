package graft.operators

import graft.SparkSpec

/** Golden-vector BPE semantics for `tokenizer_vocab`, including the
  * consecutive-merge case the space-padded encoding exists for. */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(docs: Seq[(Long, String)]): String = {
    val dir = tmpDir("bpe")
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("golden merge table: weighted pair counts, lexicographic tie-break, learned multi-char symbols") {
    // word frequencies: the x5, then x3, cat x2
    val dir = fixture(Seq(
      (1L, "the the the the the"),
      (2L, "then then then"),
      (3L, "cat cat")))
    val out = graft.SparkEntry.queries("tokenizer_vocab")(spark, dir)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(out == Seq(
      // "h e" and "t h" both count 8 (5 from the + 3 from then): tie breaks
      // to the lexicographically smaller pair string
      (1, "h", "e", "he", 8L),
      // the learned symbol participates in the next round's pairs
      (2, "t", "he", "the", 8L),
      (3, "the", "n", "then", 3L),
      // "a t" vs "c a" tie at 2 -> "a t" first
      (4, "a", "t", "at", 2L),
      // this corpus trains to exhaustion before the step budget: "c at"
      // merges at step 5 and steps 6..Steps contribute no rows
      (5, "c", "at", "cat", 2L)))
  }

  test("consecutive merges inside one word: 'aaaa' becomes two 'aa' symbols, then one 'aaaa'") {
    // if symbols shared separators, applying (a,a) to "a a a a" would stop
    // after one merge and step 2's top pair would be ("aa", "a"), not
    // ("aa", "aa") — this pins the per-symbol padding encoding
    val dir = fixture(Seq((1L, "aaaa aaaa aaaa"), (2L, "xy xy")))
    val out = graft.SparkEntry.queries("tokenizer_vocab")(spark, dir)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(out.take(2) == Seq(
      (1, "a", "a", "aa", 9L),   // 3 adjacent pairs x 3 occurrences
      (2, "aa", "aa", "aaaa", 3L)))
  }

  test("pair exhaustion: fewer mergeable pairs than steps yields a short table, not an error") {
    // single two-char word: step 1 merges it into one symbol, steps 2-4
    // find no pairs and contribute no rows
    val dir = fixture(Seq((1L, "ab ab")))
    val out = graft.SparkEntry.queries("tokenizer_vocab")(spark, dir)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(out == Seq((1, "a", "b", "ab", 2L)))
  }

  test("tokenizer_apply survives pair exhaustion: every doc still encoded") {
    // steps 3-4 find no pairs; before the exhaustion guard the empty
    // winner's cross join annihilated the vocabulary and apply returned
    // ZERO rows for the whole corpus
    val dir = fixture(Seq((1L, "ab ab"), (2L, "cd")))
    val out = graft.SparkEntry.queries("tokenizer_apply")(spark, dir)
      .selectExpr("doc_id", "n_words", "n_symbols", "chars_per_symbol")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 2L, 2.0), (2L, 1L, 1L, 2.0)),
      s"both docs fully encoded under the merges that DID exist, got $out")
  }
}
