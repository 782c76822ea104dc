package graft.operators

import graft.SparkSpec

/** classifier_auc: the Mann–Whitney midrank closed form pinned by hand
  * (perfect, reversed, tied, chance), the single-class guard, a
  * plain-Scala replay over duplicated scores, and the loud guard.
  * Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class ClassifierAucSpec extends SparkSpec {

  private def frame(rows: (Long, Int)*) = {
    import spark.implicits._
    rows.toDF("score_ppb", "y")
  }

  private def auc(rows: (Long, Int)*): (Long, Long, Long, Long, Long) = {
    val r = CorpusOps.classifierAuc(frame(rows: _*), "y = 1",
      scoreCol = "score_ppb").collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("perfect, reversed and chance rankings read 1e6, 0 and 5e5 exactly") {
    assert(auc((10L, 1), (20L, 1), (1L, 0), (2L, 0)) ==
      ((4L, 2L, 2L, 1000000L, 1000000L)), "every positive above every negative")
    assert(auc((1L, 1), (2L, 1), (10L, 0), (20L, 0)) ==
      ((4L, 2L, 2L, 0L, -1000000L)), "perfectly wrong ranking is a REAL 0")
    assert(auc((7L, 1), (7L, 1), (7L, 0), (7L, 0), (7L, 0)) ==
      ((5L, 2L, 3L, 500000L, 0L)), "all-tied scores carry no information")
  }

  test("ties take half credit through midranks (the hand case)") {
    // pos {3, 2}, neg {3, 1}: midranks of positives 3.5 + 2 = 5.5
    // AUC = (5.5 - 2*3/2) / (2*2) = 0.625
    assert(auc((3L, 1), (2L, 1), (3L, 0), (1L, 0))._4 == 625000L)
  }

  test("a single-class frame reads the guard value, never a division error") {
    assert(auc((5L, 1), (9L, 1)) == ((2L, 2L, 0L, 0L, -1000000L)))
    assert(auc((5L, 0), (9L, 0))._4 == 0L)
  }

  test("pseudorandom scores with heavy duplication match a plain-Scala replay") {
    val rows = (1 to 400).map { i =>
      val s = (i.toLong * i * 131L) % 37L // 37 distinct scores over 400 rows
      (s, if ((i * 2654435761L) % 100 < 40 + s) 1 else 0) // label leans on s
    }
    val got = auc(rows: _*)
    // replay: midrank sum of positives over the sorted multiset
    val sorted = rows.sortBy(_._1)
    val byScore = rows.groupBy(_._1).view.mapValues(_.size).toMap
    val cumBefore = scala.collection.mutable.Map[Long, Long]()
    var c = 0L
    sorted.map(_._1).distinct.foreach { s => cumBefore(s) = c; c += byScore(s) }
    val np = rows.count(_._2 == 1).toLong
    val nn = rows.size - np
    val s2 = rows.filter(_._2 == 1)
      .map(r => 2 * cumBefore(r._1) + byScore(r._1) + 1).sum
    val want = (BigInt(s2) - BigInt(np) * (np + 1)) * 1000000 / (2 * BigInt(np) * nn)
    assert(got._4 == want.toLong, s"got ${got._4}, replay $want")
    assert(got._4 > 500000L, "the leaning labels must read above chance")
  }

  test("the score-column guard is loud") {
    intercept[IllegalArgumentException](
      CorpusOps.classifierAuc(frame((1L, 1)), "y = 1", scoreCol = "nope"))
  }
}
