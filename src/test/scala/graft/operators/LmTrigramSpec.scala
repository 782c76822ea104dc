package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** lm_trigram_score: the Stupid Backoff ladder (Brants et al. 2007 §4)
  * pinned rung by rung on a constructed train/held-out pair — every q
  * value below is hand-computed integer arithmetic, so a change to any
  * rung's scaling or floor order fails loudly. Cross-engine exactness
  * is the DuckDB oracle's job at sf0.01.
  */
class LmTrigramSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2),
      docSchema)

  // train (even ids): tokens 9 total; trigrams {the cat sat, cat sat on,
  // sat on the, on the mat, a dog ran}; bigrams {the cat, cat sat,
  // sat on, on the, the mat, a dog, dog ran}; unigram counts: the=2,
  // a=1, dog=1, ... N=9
  private val corpus = docs(
    0L -> "the cat sat on the mat",
    2L -> "a dog ran",
    1L -> "the cat sat on a dog",
    3L -> "zebra qux zap")

  test("each backoff rung produces its hand-computed integer q") {
    val got = TextOps.lmTrigramScore(corpus).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 3L))
    val d1 = got(1L)
    // positions of doc 1: "the cat sat" (tri hit, 1e6), "cat sat on"
    // (tri hit, 1e6), "sat on a" (uni rung: ((1*1e6 div 9)*2 div 5)*2
    // div 5 = 17777), "on a dog" (big rung: (1*1e6 div 1)*2 div 5 =
    // 400000)
    assert(d1.getLong(1) == 4L, "n_trigrams")
    assert(d1.getLong(2) == 2L, "n_tri_hit")
    assert(d1.getLong(3) == 1L, "n_big_hit")
    assert(d1.getLong(4) == 1L, "n_uni_hit")
    assert(d1.getDouble(5) == (1000000L + 1000000L + 17777L + 400000L).toDouble / 4000000.0)
    val d3 = got(3L)
    // fully-unseen vocabulary: all rungs miss, q = 0
    assert(d3.getLong(1) == 1L && d3.getLong(2) == 0L &&
      d3.getLong(3) == 0L && d3.getLong(4) == 0L && d3.getDouble(5) == 0.0)
  }

  test("score-on-train degenerates to all-trigram-hit (backoff never fires)") {
    val got = TextOps.lmTrigramScore(corpus, "true", "true").collect()
    assert(got.length == 4) // every doc has >= 3 tokens -> all score
    got.foreach { r =>
      assert(r.getLong(2) == r.getLong(1), s"doc ${r.getLong(0)}: every trigram seen")
      assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
    }
  }

  test("scores are bounded in [0, 1] on the fixture corpus") {
    val rows = graft.SparkEntry.queries("lm_trigram_score")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getDouble(5)
      assert(s >= 0.0 && s <= 1.0, s"doc ${r.getLong(0)} score $s")
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) <= r.getLong(1))
    }
  }
}
