package graft.operators

import graft.SparkSpec

/** classifier_lift: the gains table replayed by hand, the ties-never-split
  * rule, the no-positives guard, the buckets knob and loud guards.
  * Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class ClassifierLiftSpec extends SparkSpec {

  private def frame(rows: (Long, Int)*) = {
    import spark.implicits._
    rows.toDF("score_ppb", "y")
  }

  private def lift(buckets: Int, rows: (Long, Int)*): Seq[(Long, Long, Long, Long, Long, Long)] =
    CorpusOps.classifierLift(frame(rows: _*), "y = 1", buckets = buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq

  test("the gains table replays by hand") {
    // scores 10..1 distinct, positives on the top three, 5 buckets of 2
    val rows = (1L to 10L).map(s => (s, if (s >= 8L) 1 else 0))
    val got = lift(5, rows: _*)
    assert(got == Seq(
      (1L, 2L, 2L, 1000L, 3333L, 666L),
      (2L, 2L, 1L, 500L, 1666L, 1000L),
      (3L, 2L, 0L, 0L, 0L, 1000L),
      (4L, 2L, 0L, 0L, 0L, 1000L),
      (5L, 2L, 0L, 0L, 0L, 1000L)),
      "top bucket lift = 1/baseRate when it is pure positive")
  }

  test("tie groups never split across deciles (the rfm rule)") {
    val got = lift(2, (5L, 1), (5L, 0), (5L, 0), (1L, 0))
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 3L), (2L, 1L)),
      "three tied rows stay together; deciles go uneven, deliberately")
    // degenerate: ONE score value -> one decile holding everything
    val one = lift(4, (7L, 1), (7L, 0), (7L, 1), (7L, 0))
    assert(one == Seq((1L, 4L, 2L, 500L, 1000L, 1000L)),
      "an uninformative scorer reads lift exactly 1.000")
  }

  test("a frame with no positives reads the guard, never a division error") {
    val got = lift(2, (9L, 0), (5L, 0), (1L, 0), (3L, 0))
    assert(got.forall(r => r._5 == 0L && r._6 == 0L))
  }

  test("pseudorandom scores match a plain-Scala replay") {
    val rows = (1 to 300).map { i =>
      val s = (i.toLong * i * 131L) % 23L
      (s, if ((i * 2654435761L) % 100 < 30 + 2 * s) 1 else 0)
    }
    val b = 4
    val got = lift(b, rows: _*)
    // replay with the same distribution-cumulative decile rule
    val n = rows.size.toLong
    val np = rows.count(_._2 == 1).toLong
    val groups = rows.groupBy(_._1).toSeq.sortBy(-_._1)
    var cp = 0L
    val dec = scala.collection.mutable.Map[Long, (Long, Long)]()
    groups.foreach { case (_, g) =>
      val d = cp * b / n + 1
      val (nd, pd) = dec.getOrElse(d, (0L, 0L))
      dec(d) = (nd + g.size, pd + g.count(_._2 == 1))
      cp += g.size
    }
    var cum = 0L
    val want = dec.toSeq.sortBy(_._1).map { case (d, (nd, pd)) =>
      cum += pd
      (d, nd, pd, pd * 1000 / nd,
        (BigInt(pd) * n * 1000 / (BigInt(nd) * np)).toLong, cum * 1000 / np)
    }
    assert(got == want)
  }

  test("knob guards are loud") {
    intercept[IllegalArgumentException](
      CorpusOps.classifierLift(frame((1L, 1)), "y = 1", buckets = 1))
    intercept[IllegalArgumentException](
      CorpusOps.classifierLift(frame((1L, 1)), "y = 1", scoreCol = "nope"))
  }
}
