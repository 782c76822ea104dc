package graft.operators

import graft.SparkSpec

/** chinchilla_plan: the D = 20·N sizing arithmetic pinned on hand
  * corpora — d_opt, the DECIMAL-folded teraflops, milli-epoch demand
  * and the cap-feasibility flag, plus the empty-corpus sentinel.
  * Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class ChinchillaSpec extends SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("hand-computed plan rows on a 10-token corpus") {
    val d = docs("a b c d e", "f g h i j") // 10 tokens
    val r = Curation.chinchillaPlan(d, grid = Seq(100L, 1000000000L))
      .collect()
    assert(r.length == 2)
    val small = r(0)
    assert(small.getLong(0) == 100L)
    assert(small.getLong(1) == 2000L, "d_opt = 20N")
    assert(small.getLong(2) == 0L, "120*100^2 div 1e12 floors to 0 TFLOPs")
    assert(small.getLong(3) == 10L, "corpus_tokens")
    assert(small.getLong(4) == 200000L, "2000*1000 div 10 milli-epochs")
    assert(small.getInt(5) == 0, "200 epochs >> the 4-epoch cap")
    val big = r(1)
    assert(big.getLong(2) == 120000000L, "120*(1e9)^2 div 1e12 = 1.2e8 TFLOPs")
  }

  test("a corpus past 5N tokens fits the 4-epoch cap") {
    // 1000 tokens, params 100: epochs_m = 2000*1000 div 1000 = 2000 <= 4000
    val d = docs(Seq.fill(1000)("t").mkString(" "))
    val r = Curation.chinchillaPlan(d, grid = Seq(100L)).collect()
    assert(r(0).getLong(4) == 2000L && r(0).getInt(5) == 1)
  }

  test("an empty corpus reports the -1 sentinel, not a division error") {
    import spark.implicits._
    val d = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = Curation.chinchillaPlan(d, grid = Seq(100L)).collect()
    assert(r(0).getLong(3) == 0L && r(0).getLong(4) == -1L && r(0).getInt(5) == 0)
  }

  test("the rule and cap knobs flow through") {
    val d = docs(Seq.fill(100)("t").mkString(" ")) // 100 tokens
    // tokensPerParam 1: d_opt = 100, epochs_m = 100*1000 div 100 = 1000
    val r = Curation.chinchillaPlan(d, grid = Seq(100L),
      tokensPerParam = 1L, capMilliEpochs = 999L).collect()
    assert(r(0).getLong(1) == 100L && r(0).getLong(4) == 1000L)
    assert(r(0).getInt(5) == 0, "1000 > the 999 cap")
  }
}
