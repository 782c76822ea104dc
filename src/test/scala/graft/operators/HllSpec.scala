package graft.operators

import graft.SparkSpec
import graft.functions.Portable.{MIX, MIX2, P, P2, P61}

/** hll_distinct: the register algebra (fingerprint mix, index, trailing-zero
  * rank), the exact-integer harmonic estimate and the sketch-only schema
  * replayed against an independent in-JVM HLL over the same token hashes.
  * Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class HllSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  /** Plain-Scala replay: token char-polyhashes, trigram paired fingerprints,
    * the P61 mix, m registers of max trailing-zero rank, and the DECIMAL
    * estimate via BigInt — sharing NO code with the operator. */
  private def replay(texts: Seq[String], m: Int): (Long, Long, Long) = {
    val log2m = 63 - java.lang.Long.numberOfLeadingZeros(m.toLong)
    val cap = 62 - log2m
    val fps = texts.flatMap { t =>
      val th = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .map(_.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % P))
      th.sliding(3).filter(_.length == 3).map { w =>
        ((w(0) * MIX + w(1)) % P * MIX + w(2)) % P * 2147483648L +
          ((w(0) * MIX2 + w(1)) % P2 * MIX2 + w(2)) % P2
      }
    }
    val regs = new Array[Int](m)
    fps.foreach { fp =>
      val v = ((fp % 2147483648L) * MIX % P61 + (fp / 2147483648L) * MIX2 % P61) % P61
      val w = v / m
      val rho = if (w == 0) cap else java.lang.Long.numberOfTrailingZeros(w) + 1
      val idx = (v % m).toInt
      if (rho > regs(idx)) regs(idx) = rho.toInt
    }
    val sScaled = regs.map(r => BigInt(1) << (cap - r).toInt).sum
    val est = (BigInt(CorpusOps.hllAlphaPpm(m)) * m * m * (BigInt(1) << cap.toInt) /
      (sScaled * 1000000)).toLong
    (est, fps.distinct.size.toLong, regs.count(_ == 0).toLong)
  }

  test("estimate, exact and zero-register counts replay the in-JVM model") {
    val texts = (0 until 40).map(i =>
      (0 until 30).map(j => s"w${(i * 7 + j * j) % 97}").mkString(" "))
    val got = CorpusOps.hllDistinct(
      docs(texts.zipWithIndex.map { case (t, i) => (i.toLong, "s", t) }: _*),
      m = 64).collect()
    val (est, exact, zeros) = replay(texts, 64)
    assert(got.length == 1)
    assert(got(0).getLong(1) == est, s"estimate ${got(0).getLong(1)} != model $est")
    assert(got(0).getLong(2) == exact)
    assert(got(0).getLong(3) == math.abs(est - exact) * 1000000L / exact)
    assert(got(0).getLong(4) == zeros)
  }

  test("the estimate lands near truth out of the small range (m = 64)") {
    // ~2000 distinct trigrams >> 2.5 * 64: the raw estimator regime
    val texts = (0 until 100).map(i =>
      (0 until 25).map(j => s"t${i * 25 + j}").mkString(" "))
    val r = CorpusOps.hllDistinct(
      docs(texts.zipWithIndex.map { case (t, i) => (i.toLong, "s", t) }: _*),
      m = 64).collect()(0)
    assert(r.getLong(3) < 400000L,
      s"abs_err_ppm ${r.getLong(3)} is outside the ~13% (1.04/sqrt(64)) regime")
    assert(r.getLong(4) == 0L, "no zero registers at this density")
  }

  test("sketch-only mode drops the exact columns; estimate is identical") {
    val texts = (0 until 20).map(i => s"a$i b$i c$i d$i e$i")
    val d = docs(texts.zipWithIndex.map { case (t, i) => (i.toLong, s"src${i % 2}", t) }: _*)
    val full = CorpusOps.hllDistinct(d, m = 32).collect()
    val slim = CorpusOps.hllDistinct(d, m = 32, withExact = false)
    assert(slim.columns.toSeq == Seq("source", "est_distinct", "zero_registers"))
    val bySrc = slim.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    full.foreach { r =>
      assert(bySrc(r.getString(0)) == ((r.getLong(1), r.getLong(4))),
        "sketch path must not depend on the exact pass")
    }
  }

  test("per-source isolation and sub-trigram docs contribute nothing") {
    val d = docs((1L, "a", "x y z w"), (2L, "b", "x y z w"), (3L, "a", "p q"))
    val got = CorpusOps.hllDistinct(d, m = 16).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("a", "b"))
    // both sources hold the same 2 distinct trigrams -> identical sketches
    assert(got(0).getLong(1) == got(1).getLong(1))
    assert(got.forall(_.getLong(2) == 2L), "doc 3 (2 tokens) adds no trigram")
  }

  test("an empty register frame reads as nothing-seen: est 0, all registers empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Int)].toDF("idx", "mj")
    val r = CorpusOps.hllEstimate(empty, 64, Seq.empty).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((64L, 0L)),
      "streaming batch 0 must read est 0, never NULL or the alpha-bias floor")
  }

  test("a non-power-of-two or tiny m is loud") {
    val d = docs((1L, "a", "x y z"))
    intercept[IllegalArgumentException](CorpusOps.hllDistinct(d, m = 100))
    intercept[IllegalArgumentException](CorpusOps.hllDistinct(d, m = 8))
  }

  // ---- hll_overlap: register-merge union + inclusion–exclusion ----------

  /** Registers + distinct fp set for one source — the union/intersection
    * replay composes these the way the operator composes register tables. */
  private def replayRegs(texts: Seq[String], m: Int): (Array[Int], Set[Long]) = {
    val log2m = 63 - java.lang.Long.numberOfLeadingZeros(m.toLong)
    val cap = 62 - log2m
    val fps = texts.flatMap { t =>
      val th = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .map(_.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % P))
      th.sliding(3).filter(_.length == 3).map { w =>
        ((w(0) * MIX + w(1)) % P * MIX + w(2)) % P * 2147483648L +
          ((w(0) * MIX2 + w(1)) % P2 * MIX2 + w(2)) % P2
      }
    }
    val regs = new Array[Int](m)
    fps.foreach { fp =>
      val v = ((fp % 2147483648L) * MIX % P61 + (fp / 2147483648L) * MIX2 % P61) % P61
      val w = v / m
      val rho = if (w == 0) cap else java.lang.Long.numberOfTrailingZeros(w) + 1
      val idx = (v % m).toInt
      if (rho > regs(idx)) regs(idx) = rho.toInt
    }
    (regs, fps.toSet)
  }

  private def estOf(regs: Array[Int], m: Int): Long = {
    val cap = 62 - (63 - java.lang.Long.numberOfLeadingZeros(m.toLong))
    val sScaled = regs.map(r => BigInt(1) << (cap - r).toInt).sum
    (BigInt(CorpusOps.hllAlphaPpm(m)) * m * m * (BigInt(1) << cap.toInt) /
      (sScaled * 1000000)).toLong
  }

  test("overlap replays the in-JVM register merge: union is per-index max") {
    val m = 64
    val aTexts = (0 until 30).map(i => (0 until 20).map(j => s"w${(i * 3 + j) % 80}").mkString(" "))
    val bTexts = (0 until 30).map(i => (0 until 20).map(j => s"w${(i * 3 + j) % 80 + 40}").mkString(" "))
    val d = docs(
      (aTexts.zipWithIndex.map { case (t, i) => (i.toLong, "sa", t) } ++
        bTexts.zipWithIndex.map { case (t, i) => (1000L + i, "sb", t) }): _*)
    val got = CorpusOps.hllOverlap(d, m = m).collect()
    assert(got.length == 1)
    val (ra, fa) = replayRegs(aTexts, m)
    val (rb, fb) = replayRegs(bTexts, m)
    val union = ra.zip(rb).map { case (x, y) => math.max(x, y) }
    val (estA, estB, estU) = (estOf(ra, m), estOf(rb, m), estOf(union, m))
    val r = got(0)
    assert((r.getString(0), r.getString(1)) == (("sa", "sb")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((estA, estB, estU)))
    assert(r.getLong(5) == math.max(0L, estA + estB - estU), "inclusion-exclusion")
    assert(r.getLong(6) == fa.intersect(fb).size.toLong, "exact intersection")
    assert(r.getLong(7) == math.max(0L, estA + estB - estU) * 1000000L / estU)
  }

  test("overlap extremes: identical sources estimate full overlap; disjoint near zero") {
    val same = (0 until 25).map(i => s"p$i q$i r$i s$i")
    val d = docs(
      (same.zipWithIndex.map { case (t, i) => (i.toLong, "x", t) } ++
        same.zipWithIndex.map { case (t, i) => (100L + i, "y", t) }): _*)
    val r = CorpusOps.hllOverlap(d, m = 32).collect()(0)
    // identical register tables: union == each side, intersect == est
    assert(r.getLong(2) == r.getLong(3) && r.getLong(3) == r.getLong(4))
    assert(r.getLong(5) == r.getLong(2) && r.getLong(7) == 1000000L)
    val dj = docs((1L, "x", "a b c d e"), (2L, "y", "p q r s t"))
    val rd = CorpusOps.hllOverlap(dj, m = 32).collect()(0)
    assert(rd.getLong(6) == 0L, "disjoint sources share no fingerprint")
  }

  test("overlap sketch-only mode drops the exact column and its corpus pass") {
    val texts = (0 until 20).map(i => s"a$i b$i c$i d$i")
    val d = docs(texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, s"s${i % 3}", t) }: _*)
    val slim = CorpusOps.hllOverlap(d, m = 32, withExact = false)
    assert(slim.columns.toSeq == Seq("src_a", "src_b", "est_a", "est_b",
      "est_union", "est_intersect", "jaccard_ppm"))
    val full = CorpusOps.hllOverlap(d, m = 32).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    slim.collect().foreach { r =>
      assert(full((r.getString(0), r.getString(1))) ==
        ((r.getLong(2), r.getLong(4), r.getLong(5))),
        "sketch path must not depend on the exact pass")
    }
    assert(full.size == 3, "three source pairs")
  }
}
