package graft.operators

import graft.SparkSpec

/** Pins labelNoiseDetect's Confident-Learning rules by hand: per-class
  * mean thresholds (trunc), confident flags, the off-diagonal suspect
  * rule, and the single-class NULL-threshold guard. */
class LabelNoiseSpec extends SparkSpec {
  import spark.implicits._

  test("thresholds, confident flags and suspects match the hand computation") {
    // positives (en): 100, 200, 600, -300 -> t1 = 600/4 = 150
    // negatives:     -100, 0, -500, 500  -> t0 = -100/4 = -25
    val scored = Seq(
      (1L, 100L, "en"), (2L, 200L, "en"), (3L, 600L, "en"), (4L, -300L, "en"),
      (5L, -100L, "xx"), (6L, 0L, "xx"), (7L, -500L, "xx"), (8L, 500L, "xx")
    ).toDF("doc_id", "score_ppb", "lang")
    val out = CorpusOps.labelNoiseDetect(scored, "lang = 'en'").collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getAs[Int]("conf_pos"), r.getAs[Int]("conf_neg"),
          r.getAs[Int]("suspect"))).toMap
    // conf_pos: sc >= 150 -> docs 2, 3, 8; conf_neg: sc <= -25 -> 4, 5, 7
    // suspects: the en doc that is confidently negative (4) and the
    // non-en doc that is confidently positive (8)
    assert(out == Map(
      1L -> (1, 0, 0, 0), 2L -> (1, 1, 0, 0), 3L -> (1, 1, 0, 0),
      4L -> (1, 0, 1, 1), 5L -> (0, 0, 1, 0), 6L -> (0, 0, 0, 0),
      7L -> (0, 0, 1, 0), 8L -> (0, 1, 0, 1)))
  }

  test("a single-class frame flags nothing (NULL missing-class threshold)") {
    val scored = Seq((1L, 100L, "en"), (2L, -900L, "en"))
      .toDF("doc_id", "score_ppb", "lang")
    val out = CorpusOps.labelNoiseDetect(scored, "lang = 'en'").collect()
    assert(out.forall(_.getAs[Int]("suspect") == 0),
      "no negative threshold exists, so no positive can be a suspect")
    assert(out.forall(_.getAs[Int]("conf_neg") == 0))
  }
}
