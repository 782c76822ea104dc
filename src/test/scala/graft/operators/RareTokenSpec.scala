package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** rare_token_docs: the document-frequency census and per-doc rare
  * density pinned on a hand-built corpus, plus the rareDf knob.
  */
class RareTokenSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2),
      schema)

  // df census: common -> 3 docs, shared -> 2, eel/fox/gnu -> 1 each;
  // "common common" in doc 0 pins the DISTINCT-per-doc rule
  private val corpus = docs(
    0L -> "common common shared eel",
    1L -> "common shared fox",
    2L -> "common gnu")

  test("df counts documents (distinct per doc); density is exact") {
    val got = CorpusOps.rareTokenDocs(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // rareDf = 2: rare = {shared, eel, fox, gnu}; common (df 3) is not
    assert(got(0L) == ((3L, 2L, 666L)), "doc 0: {common, shared, eel} -> 2 rare")
    assert(got(1L) == ((3L, 2L, 666L)))
    assert(got(2L) == ((2L, 1L, 500L)))
  }

  test("rareDf = 1 keeps only hapax tokens rare") {
    val got = CorpusOps.rareTokenDocs(corpus, rareDf = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L), "eel / fox / gnu only")
  }

  test("null-text docs are absent; all-common corpora report zero rare") {
    val d = docs(0L -> "same words", 1L -> "same words", 2L -> null,
      3L -> "same words")
    val got = CorpusOps.rareTokenDocs(d).collect() // df = 3 > rareDf = 2
    assert(got.map(_.getLong(0)).toSet == Set(0L, 1L, 3L))
    assert(got.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
  }
}
