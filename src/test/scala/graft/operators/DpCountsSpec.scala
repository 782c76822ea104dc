package graft.operators

import graft.SparkSpec
import graft.functions.Portable.{MIX, MIX2, P, P2, P61}

/** dp_counts: the dyadic geometric decode pinned on literal uniforms, the
  * full hash→noise chain replayed in plain Scala, the clamp, the release
  * column contract and the mechanism's mass shape. Cross-engine exactness
  * is the DuckDB oracle's job at sf0.01.
  */
class DpCountsSpec extends SparkSpec {

  import org.apache.spark.sql.functions.expr

  /** The in-JVM twin of the operator's entire noise chain. */
  private def replayNoise(key: String): Long = {
    var h = 0L
    var i = 0
    while (i < key.length) {
      val cp = key.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    val h1 = ((((h % P) * (h % P)) % P) * MIX + (h % P)) % P
    val h2 = ((((h % P2) * (h % P2)) % P2) * MIX2 + (h % P2)) % P2
    val fp = h1 * 2147483648L + h2
    val v = (((fp % 2147483648L) * MIX) % P61 + ((fp / 2147483648L) * MIX2) % P61) % P61
    decode(v % 3221225470L)
  }

  /** The in-JVM twin of geometricNoiseExpr's decode. */
  private def decode(u: Long): Long =
    if (u < 1073741824L) 0L
    else {
      val w = u - 1073741824L
      val sign = 1L - 2L * (w % 2L)
      val rm = 1073741823L - w / 2L
      sign * (31L - java.lang.Long.toBinaryString(rm).length)
    }

  test("the dyadic decode is exact on every boundary uniform") {
    import spark.implicits._
    // (u, expected): the z = 0 region edges, the first/last uniform of
    // each sign at magnitude 1, and the truncated tail at |z| = 30
    val cases = Seq(
      0L -> 0L, 1073741823L -> 0L,              // z = 0: exactly 2^30 units
      1073741824L -> 1L, 1073741825L -> -1L,    // first magnitude-1 pair
      2147483646L -> 1L, 2147483647L -> -1L,    // last magnitude-1 pair
      2147483648L -> 2L,                        // first magnitude-2 uniform
      3221225468L -> 30L, 3221225469L -> -30L)  // the final tail unit pair
    val got = cases.map(_._1).toDF("u")
      .withColumn("z", expr(CorpusOps.geometricNoiseExpr("u")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (u, want) =>
      assert(got(u) == want, s"u=$u")
      assert(decode(u) == want, s"replay u=$u")
    }
  }

  test("magnitude masses halve: each |z| gets exactly 2^(30-z) units per sign") {
    // walk the cumulative segment boundaries in the v-space decode
    // rather than 2^30 uniforms: segment z covers rm in [2^(30-z), 2^(31-z))
    (1 to 30).foreach { z =>
      val size = 1L << (30 - z)
      // first and last v of the segment decode to z on the positive lane
      val uFirst = 1073741824L + 2L * ((1L << 30) - (1L << (31 - z)))
      val uLast = 1073741824L + 2L * ((1L << 30) - (1L << (31 - z)) + size - 1L)
      assert(decode(uFirst) == z.toLong, s"segment start z=$z")
      assert(decode(uLast) == z.toLong, s"segment end z=$z")
      if (z > 1) assert(decode(uFirst - 2L) == (z - 1).toLong, "previous segment below")
    }
  }

  test("the full hash chain matches the in-JVM replay and is idempotent") {
    import spark.implicits._
    val rows = Seq(("1-URGENT", "F", 3L), ("1-URGENT", "O", 2L), ("5-LOW", "P", 1L))
      .flatMap { case (a, b, n) => Seq.fill(n.toInt)((a, b)) }
    val df = rows.toDF("prio", "status")
    val got = CorpusOps.dpCounts(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == 3)
    got.foreach { case (a, b, n, noise, released) =>
      val want = replayNoise(s"$a|$b")
      assert(noise == want, s"key $a|$b")
      assert(released == math.max(0L, n + noise))
    }
    // deterministic: a second run releases the identical frame
    assert(CorpusOps.dpCounts(df).collect().toSeq ==
      CorpusOps.dpCounts(df).collect().toSeq)
  }

  test("released counts clamp at zero; withTrue=false ships only the release") {
    import spark.implicits._
    // hunt a key whose noise is <= -2 via the replay, then give it a
    // 1-row group: true 1 + noise <= -1 must release 0
    val k = (0 to 999).map(i => s"key$i").find(replayNoise(_) <= -2L).get
    val df = Seq(k).toDF("k")
    val full = CorpusOps.dpCounts(df).collect()(0)
    assert(full.getLong(1) == 1L && full.getLong(3) == 0L,
      s"1 + ${full.getLong(2)} clamps to 0")
    val rel = CorpusOps.dpCounts(df, withTrue = false)
    assert(rel.columns.toSeq == Seq("k", "released"))
    assert(rel.collect()(0).getLong(1) == 0L)
    intercept[IllegalArgumentException](CorpusOps.dpCounts(df.select()))
  }

  test("the mechanism's shape holds over a key population: ~1/3 zeros, symmetric") {
    val draws = (0 until 3000).map(i => replayNoise(s"group-$i"))
    val zeros = draws.count(_ == 0L).toDouble / draws.size
    assert(zeros > 0.30 && zeros < 0.37, s"P(0) = $zeros, want ~1/3")
    val pos = draws.count(_ > 0L)
    val neg = draws.count(_ < 0L)
    assert(math.abs(pos - neg) < draws.size / 10, s"signs $pos/$neg")
    val big = draws.count(z => math.abs(z) >= 5).toDouble / draws.size
    assert(big < 0.06, s"P(|z| >= 5) = $big, want ~2^-4/3")
  }
}
