package graft.operators

import graft.SparkSpec

/** Golden semantics for `chunk_content_defined` — pins the property the
  * operator exists for: chunk boundaries are functions of LOCAL content,
  * so an edit near the head of a document cannot disturb chunks after the
  * next boundary (fixed-stride chunking shifts every downstream chunk). */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random word soup (LCG over a small vocabulary) —
  // long enough to cross many rolling-hash boundaries
  private def soup(seed: Long, words: Int): String = {
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "india", "julia", "kilo", "lima", "mike")
    var x = seed
    (1 to words).map { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue
      vocab((x % vocab.size).toInt)
    }.mkString(" ")
  }

  private def fixture(docs: Seq[(Long, String)]): String = {
    val dir = tmpDir("cdc")
    docs.map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("edit locality: a prefix edit leaves every chunk after the next boundary intact") {
    val base = soup(42L, 120)
    val edited = "zq " + base
    val dir = fixture(Seq((1L, base), (2L, edited)))
    val rows = graft.SparkEntry.queries("chunk_content_defined")(spark, dir)
      .selectExpr("doc_id", "chunk_idx", "chunk_md5").as[(Long, Long, String)]
      .collect().toSeq
    val baseChunks = rows.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val editChunks = rows.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSet
    assert(baseChunks.size >= 3, s"fixture must cross several boundaries, got ${baseChunks.size} chunks")
    // everything after the base doc's first boundary survives the edit
    val surviving = baseChunks.drop(1)
    assert(surviving.forall(editChunks.contains),
      "all post-boundary chunks must be byte-identical after a prefix edit")
    // and the head chunk (which absorbed the edit) must differ
    assert(!editChunks.contains(baseChunks.head),
      "the head chunk contains the edit and must change")
  }

  test("chunks partition the document: lengths sum to the text length") {
    val base = soup(7L, 80)
    val dir = fixture(Seq((1L, base)))
    val rows = graft.SparkEntry.queries("chunk_content_defined")(spark, dir)
      .selectExpr("chunk_len").as[Long].collect()
    assert(rows.sum == base.length.toLong)
  }
}
