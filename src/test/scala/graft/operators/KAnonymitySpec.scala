package graft.operators

import graft.SparkSpec

/** k_anonymity: the equivalence-class profile pinned by hand, multi-column
  * keys, the k knob and the loud guards. Cross-engine exactness is the
  * DuckDB oracle's job at sf0.01.
  */
class KAnonymitySpec extends SparkSpec {

  private def q(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("zip", "age_band")
  }

  test("the class-size distribution replays by hand") {
    // classes: (a,1)x3, (a,2)x1, (b,1)x1, (b,2)x2
    val got = CorpusOps.kAnonymityProfile(q(
      ("a", 1L), ("a", 1L), ("a", 1L), ("a", 2L),
      ("b", 1L), ("b", 2L), ("b", 2L))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq((1L, 2L, 2L, 1), (2L, 1L, 2L, 1), (3L, 1L, 3L, 1)))
  }

  test("k is the gate knob; classes at or above k read safe") {
    val rows = Seq.fill(5)(("x", 1L)) ++ Seq.fill(2)(("y", 1L))
    val got = CorpusOps.kAnonymityProfile(q(rows: _*), k = 5L).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got == Map(2L -> 1, 5L -> 0), "the 5-class is exactly at k: safe")
  }

  test("every column participates in the key; guards are loud") {
    // same zip, different band -> different classes
    val got = CorpusOps.kAnonymityProfile(q(("a", 1L), ("a", 2L))).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)),
      "two singleton classes, not one pair")
    intercept[IllegalArgumentException](
      CorpusOps.kAnonymityProfile(q(("a", 1L)), k = 1L))
    intercept[IllegalArgumentException](
      CorpusOps.kAnonymityProfile(q(("a", 1L)).select()))
  }

  private def s(rows: (String, Long, String)*) = {
    import spark.implicits._
    rows.toDF("zip", "age_band", "diagnosis")
  }

  test("l-diversity: a k-anonymous homogeneous class still reads unsafe") {
    // (a,1): 3 rows, ALL 'flu'  -> diversity 1 (the homogeneity attack)
    // (b,1): 3 rows, 3 values   -> diversity 3
    // (b,2): 2 rows, 2 values   -> diversity 2
    val got = CorpusOps.lDiversityProfile(s(
      ("a", 1L, "flu"), ("a", 1L, "flu"), ("a", 1L, "flu"),
      ("b", 1L, "flu"), ("b", 1L, "cold"), ("b", 1L, "ok"),
      ("b", 2L, "flu"), ("b", 2L, "cold")), "diagnosis").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq((1L, 1L, 3L, 1), (2L, 1L, 2L, 1), (3L, 1L, 3L, 0)),
      "k_anonymity would pass all three classes at k=2; diversity flags two")
  }

  test("l-diversity: duplicate sensitive values don't inflate diversity; l is the knob") {
    val rows = Seq(("a", 1L, "x"), ("a", 1L, "x"), ("a", 1L, "y"))
    val got2 = CorpusOps.lDiversityProfile(s(rows: _*), "diagnosis", l = 2L)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got2 == Map(2L -> 0), "two DISTINCT values among three rows; at l=2 safe")
    val got3 = CorpusOps.lDiversityProfile(s(rows: _*), "diagnosis", l = 3L)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got3 == Map(2L -> 1))
  }

  test("l-diversity guards are loud") {
    intercept[IllegalArgumentException](
      CorpusOps.lDiversityProfile(s(("a", 1L, "x")), "diagnosis", l = 1L))
    intercept[IllegalArgumentException](
      CorpusOps.lDiversityProfile(s(("a", 1L, "x")), "nope"))
    intercept[IllegalArgumentException](
      CorpusOps.lDiversityProfile(
        s(("a", 1L, "x")).select("diagnosis"), "diagnosis"))
  }

  test("t-closeness: the banded TVD profile replays by hand") {
    // global: flu=3, cold=3, ok=2, N=8
    // (a,1): {flu:2}        -> (1 - 3/8)+              = 625000 ppm, band 600000
    // (b,1): {flu,cold}     -> 2*(1/2 - 3/8)           = 250000 ppm, band 200000
    // (b,2): {cold:2, ok:2} -> (1/2-3/8) + (1/2-2/8)   = 375000 ppm, band 300000
    val got = CorpusOps.tClosenessProfile(s(
      ("a", 1L, "flu"), ("a", 1L, "flu"),
      ("b", 1L, "flu"), ("b", 1L, "cold"),
      ("b", 2L, "cold"), ("b", 2L, "cold"), ("b", 2L, "ok"), ("b", 2L, "ok")),
      "diagnosis").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq((200000L, 1L, 2L, 0), (300000L, 1L, 4L, 0),
      (600000L, 1L, 2L, 1)),
      "l-diversity would pass (a,1)-style homogeneity only at l; skew is TVD's job")
  }

  test("t-closeness: a class matching the global distribution reads zero") {
    val got = CorpusOps.tClosenessProfile(s(
      ("a", 1L, "x"), ("a", 1L, "y"), ("b", 1L, "x"), ("b", 1L, "y")),
      "diagnosis").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq((0L, 2L, 4L, 0)),
      "p = q in both classes: TVD exactly 0, nothing above t")
  }

  test("t-closeness: t gates on the band floor; knobs and guards are loud") {
    val rows = Seq(("a", 1L, "x"), ("a", 1L, "x"), ("b", 1L, "y"), ("b", 1L, "y"))
    // each class concentrates on one of two equally-global values:
    // TVD = 1/2 exactly -> band floor 500000; t = 500000 flags it,
    // t = 600000 does not (the boundary is INCLUSIVE at the band floor)
    def bands(t: Long) = CorpusOps.tClosenessProfile(s(rows: _*), "diagnosis",
      tPpm = t).collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(bands(500000L) == Map(500000L -> 1))
    assert(bands(600000L) == Map(500000L -> 0))
    intercept[IllegalArgumentException](
      CorpusOps.tClosenessProfile(s(rows: _*), "diagnosis", tPpm = 450000L))
    intercept[IllegalArgumentException](
      CorpusOps.tClosenessProfile(s(rows: _*), "nope"))
    intercept[IllegalArgumentException](
      CorpusOps.tClosenessProfile(s(rows: _*), "diagnosis", tPpm = 0L))
    intercept[IllegalArgumentException](
      CorpusOps.tClosenessProfile(
        s(rows: _*).select("diagnosis"), "diagnosis"))
  }
}
