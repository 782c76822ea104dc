package graft.operators

import graft.SparkSpec

/** quantile_sketch: the HDR bucket geometry pinned value-by-value, hand
  * quantiles in the exact region, the one-sided error bound, the
  * mergeability contract (the defining sketch property) and the loud
  * guards. Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class QuantileSketchSpec extends SparkSpec {

  import org.apache.spark.sql.functions.{col, count, expr, lit}

  private val b = 5
  private val base = 1L << b

  private def bucketsOf(xs: Seq[Long]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    xs.toDF("x")
      .selectExpr("x", s"${CorpusOps.hdrBucketExpr("x", b)} AS id")
      .selectExpr("x", "id", s"${CorpusOps.hdrRepExpr("id", b)} AS rep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("bucket geometry: identity below 2^b, monotone, one-sided 2^-b error above") {
    val xs = Seq(0L, 1L, 5L, 31L, 32L, 33L, 47L, 63L, 64L, 65L, 100L, 127L,
      128L, 1000L, 65535L, 65536L, (1L << 40) - 1, 1L << 40, (1L << 40) + 12345L,
      (1L << 62) - 1L)
    val got = bucketsOf(xs)
    got.foreach { case (x, _, rep) =>
      if (x < base) assert(rep == x, s"identity region: x=$x")
      else {
        assert(rep <= x, s"lower bound: x=$x rep=$rep")
        // bucket width = rep >> b at most: (x - rep) * 2^b < rep
        assert(((x - rep) << b) < rep + base, s"2^-b error: x=$x rep=$rep")
      }
    }
    // monotone: sorted x gives sorted (non-strictly) ids
    val ids = got.sortBy(_._1).map(_._2)
    assert(ids == ids.sorted, "bucket id must be monotone in x")
    // the exact boundary: 31 is identity, 32 is the first geometric bucket
    val m = got.map(t => t._1 -> t._2).toMap
    assert(m(31L) == 31L && m(32L) == 32L && m(63L) == 47L + 16L,
      "continuity across the identity boundary")
  }

  test("negative values land in exact identity buckets") {
    val got = bucketsOf(Seq(-5L, -1L, 0L, 3L))
    got.foreach { case (x, id, rep) => assert(id == x && rep == x) }
  }

  private def frame(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("g", "x")
  }

  test("quantiles in the exact region replay by hand (type-1 rank)") {
    val vals = (1L to 10L).map(("a", _))
    val got = CorpusOps.quantileSketch(frame(vals: _*), "x").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // ceil(.5*10)=5 -> 5; ceil(.9*10)=9 -> 9; ceil(.99*10)=10 -> 10
    assert(got.toSeq == Seq((500, 10L, 5L, 5L, 0L), (900, 10L, 9L, 9L, 0L),
      (990, 10L, 10L, 10L, 0L)),
      "identity buckets make the sketch exact below 2^b")
  }

  test("est is one-sided below exact and inside the 2^-b relative bound") {
    val vals = (1 to 500).map(i => ("a", (i.toLong * i * 997L) % 10000000L + 32L))
    val got = CorpusOps.quantileSketch(frame(vals: _*), "x").collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getLong(5)))
    got.foreach { case (est, exact, errPpm) =>
      assert(est <= exact, s"one-sided: $est > $exact")
      assert(errPpm <= 1000000L / base, s"err $errPpm above the 2^-b bound")
      assert(errPpm == math.abs(est - exact) * 1000000L / exact)
    }
  }

  test("the release path drops exact columns but keeps the same estimates") {
    val vals = (1 to 200).map(i => (if (i % 2 == 0) "a" else "b", i.toLong * 321L))
    val full = CorpusOps.quantileSketch(frame(vals: _*), "x").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val rel = CorpusOps.quantileSketch(frame(vals: _*), "x", withExact = false)
    assert(rel.columns.toSeq == Seq("g", "q_pm", "n", "est_q"))
    assert(rel.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq == full)
  }

  test("histograms MERGE: two half-corpus sketches sum to the full answer") {
    val all = (1 to 400).map(i => ("a", (i.toLong * 7919L) % 1000000L))
    val (h1, h2) = all.splitAt(173)
    def hist(rows: Seq[(String, Long)]) = frame(rows: _*)
      .selectExpr("g", s"${CorpusOps.hdrBucketExpr("x", b)} AS bkt")
      .groupBy(col("g"), col("bkt")).agg(count(lit(1)).as("cnt"))
    val merged = hist(h1).union(hist(h2))
      .groupBy(col("g"), col("bkt"))
      .agg(expr("sum(cnt)").as("cnt"))
    val got = CorpusOps.hdrQuantiles(merged, Seq("g"), b, Seq(500, 900, 990))
      .orderBy(col("q_pm")).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val want = CorpusOps.quantileSketch(frame(all: _*), "x", withExact = false)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, "count-sum merge must be indistinguishable from one build")
  }

  test("guards are loud") {
    val f = frame(("a", 1L))
    intercept[IllegalArgumentException](CorpusOps.quantileSketch(f, "x", subBits = 0))
    intercept[IllegalArgumentException](CorpusOps.quantileSketch(f, "x", subBits = 17))
    intercept[IllegalArgumentException](CorpusOps.quantileSketch(f, "x", qsPm = Seq(900, 500)))
    intercept[IllegalArgumentException](CorpusOps.quantileSketch(f, "x", qsPm = Seq(500, 500)))
    intercept[IllegalArgumentException](CorpusOps.quantileSketch(f, "x", qsPm = Seq(0)))
    intercept[IllegalArgumentException](CorpusOps.quantileSketch(f, "nope"))
    intercept[IllegalArgumentException](CorpusOps.quantileSketch(f.select("x"), "x"))
  }
}
