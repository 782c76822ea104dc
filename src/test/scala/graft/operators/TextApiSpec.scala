package graft.operators

import graft.SparkSpec

/** The reusable faces of the C4 line gate and CCNet bucketing — round-10
  * API lifts. The registry entries pin oracle parity on the fixture
  * constructions; these tests pin the OPERATOR signatures on real inputs:
  * the C4 gate over genuine multi-line text (split on '\n', the
  * production path) and CCNet tertiles over an arbitrary non-fluency
  * score column.
  */
class TextApiSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(
      s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val doc1 =
    "This is a good first sentence with many words.\n" +
      "Short line.\n" +
      "Another perfectly fine sentence stands right here!\n" +
      "Do you enjoy questions with seven words?\n" +
      "this line mentions javascript so c4 drops it.\n" +
      "no terminal punctuation on this line at all"

  private def pages(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "split(text, '\n') AS lines")

  test("c4Rules on real multi-line text: every line and page rule discriminates") {
    val out = TextOps.c4Rules(pages(Seq(
      1L -> doc1,
      2L -> ("lorem ipsum dolor sit amet and so on.\n" +
        "A good long sentence that would otherwise be kept here.\n" +
        "Another good long sentence that would also be kept here.\n" +
        "A third good long sentence that would also be kept here."),
      3L -> ("function f() { return 1; }\n" +
        "A good long sentence that would otherwise be kept here.\n" +
        "Another good long sentence that would also be kept here.\n" +
        "A third good long sentence that would also be kept here."),
      4L -> ("Only two good sentences are not enough here.\n" +
        "Here is the second good sentence of the page."))))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getString(6)))
    // doc 1: 6 lines; kept = 3 (short line, javascript line, and the
    // unterminated line drop) -> page survives at exactly minKeptLines
    val expectedKept1 = Seq(
      "This is a good first sentence with many words.",
      "Another perfectly fine sentence stands right here!",
      "Do you enjoy questions with seven words?").mkString("\n")
    assert(out(0) == (1L, 6L, 3L, 0, 0, 1, md5hex(expectedKept1)),
      s"doc 1 mismatch: ${out(0)}")
    // doc 2 dies to lorem ipsum, doc 3 to the brace, doc 4 to < 3 kept
    assert(out(1)._4 == 1 && out(1)._6 == 0, s"lorem page must drop: ${out(1)}")
    assert(out(2)._5 == 1 && out(2)._6 == 0, s"brace page must drop: ${out(2)}")
    assert(out(3) == (4L, 2L, 2L, 0, 0, 0, md5hex(
      "Only two good sentences are not enough here.\n" +
        "Here is the second good sentence of the page.")),
      s"doc 4 mismatch: ${out(3)}")
  }

  test("c4Rules knobs: minLineWords and minKeptLines move the gate") {
    val p = pages(Seq(1L -> doc1, 4L -> ("Only two good sentences are not enough here.\n" +
      "Here is the second good sentence of the page.")))
    // loosening the word rule to 2 admits 'Short line.' on doc 1
    val loose = TextOps.c4Rules(p, minLineWords = 2).collect()
    assert(loose(0).getLong(2) == 4L, s"minLineWords=2 keeps the short line: ${loose(0)}")
    // loosening the page rule to 2 kept lines admits doc 4
    val keep4 = TextOps.c4Rules(p, minKeptLines = 2).collect()
    assert(keep4(1).getInt(5) == 1, s"minKeptLines=2 keeps doc 4: ${keep4(1)}")
  }

  test("ccnetBuckets over an arbitrary score column: distribution cutoffs, ties to the better bucket") {
    // lang 'en': scores [5, 5, 3, 2, 1] (n = 5). Top-down cumulative over
    // DISTINCT values: 5->2, 3->3, 2->4, 1->5; c2 = largest score with
    // cum >= ceil(5/3) = 5, c1 = largest with cum >= ceil(10/3) = 2. So
    // BOTH score-5 docs land in head (tie -> better bucket), 3 and 2 in
    // middle, 1 in tail. lang 'de' gets its own independent cutoffs.
    val scored = Seq(
      (1L, "en", 5L), (2L, "en", 5L), (3L, "en", 3L), (4L, "en", 2L),
      (5L, "en", 1L), (10L, "de", 9L), (11L, "de", 8L), (12L, "de", 7L))
      .toDF("doc_id", "lang", "q")
    val out = TextOps.ccnetBuckets(scored, scoreCol = "q").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(
      1L -> "head", 2L -> "head", 3L -> "middle", 4L -> "middle",
      5L -> "tail", 10L -> "head", 11L -> "middle", 12L -> "tail"),
      s"bucket assignment mismatch: $out")
    // the score column's NAME survives into the output schema
    assert(TextOps.ccnetBuckets(scored, scoreCol = "q").columns.toSeq ==
      Seq("doc_id", "lang", "q", "bucket"))
  }
}
