package graft.operators

import graft.SparkSpec

/** dedup_minhash_capped: the recall-preserving bounded pair emitter
  * (StreamingNearDup's maxPerBucket semantics in batch). Its oracle pins
  * cross-engine exactness; THIS suite pins the semantics against the
  * all-pairs and star emitters — containment both ways (star ⊆ capped ⊆
  * all-pairs), the cap=1 = star degeneracy, the O(cap·n) volume bound on
  * a saturated clique, the CHAIN recall capped preserves where star
  * loses it, and the profile verdict (starRegime) that selects among
  * them.
  */
class CappedDedupSpec extends SparkSpec {
  import spark.implicits._

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
  private def drops(p: Set[(Long, Long)]): Set[Long] = p.map(_._2)

  test("fixture: star ⊆ capped ⊆ all-pairs, all canonical-ordered") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val all = pairSet(Dedup.minhashPairsOf(d))
    val capped = pairSet(Dedup.minhashPairsCappedOf(d))
    val star = pairSet(Dedup.minhashPairsStarOf(d))
    assert(capped.subsetOf(all), s"capped extras: ${capped -- all}")
    assert(star.subsetOf(capped), s"capped must dominate star, missing: ${star -- capped}")
    assert(capped.forall { case (a, b) => a < b })
  }

  test("band-split grid: star ⊆ capped ⊆ all-pairs at EVERY swept (nb × w) point") {
    // The recall knob (band split) must compose with the volume knob
    // (emitter): at every grid point the sweep measures, the emitter
    // ladder's containment — and the cap=1 ≡ star degeneracy — hold, so
    // a caller retuning bands for recall keeps the bounded emitters.
    // Fixture: a saturated 80-twin clique, so containment is STRICT
    // wherever the split actually crowds a bucket past the cap.
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "wanders across the wide open field toward the river looking for " +
      "something interesting to chase before the sun finally sets tonight"
    val sat = (0 until 80).map(i =>
      (i.toLong, if (i == 0) base else base + f" zzsalt$i%03d")).toDF("doc_id", "text")
    val cap = 4
    Dedup.bandSweepCfgs.foreach { case (nb, w) =>
      val all = pairSet(Dedup.minhashPairsOf(sat, nb, w))
      val capped = pairSet(Dedup.minhashPairsCappedOf(sat, cap, nb, w))
      val star = pairSet(Dedup.minhashPairsStarOf(sat, nb, w))
      assert(star.subsetOf(capped), s"($nb x $w): star must be ⊆ capped")
      assert(capped.subsetOf(all), s"($nb x $w): capped must be ⊆ all-pairs")
      assert(pairSet(Dedup.minhashPairsCappedOf(sat, 1, nb, w)) == star,
        s"($nb x $w): cap = 1 must degenerate to the star emitter")
      val mb = Dedup.bucketProfileOf(Dedup.minhashSigOf(
          sat.select("doc_id", "text")), cap, nb, w)
        .collect()(0).getAs[Long]("max_bucket")
      if (mb > cap)
        assert(star.size < capped.size && capped.size < all.size,
          s"($nb x $w): max_bucket $mb exceeds the cap, containment must be strict " +
            s"(${star.size} / ${capped.size} / ${all.size})")
    }
    // the operating point is known-saturated on the clique — at least
    // there the strict branch above must have engaged
    val mb44 = Dedup.bucketProfileOf(Dedup.minhashSigOf(
        sat.select("doc_id", "text")), cap).collect()(0).getAs[Long]("max_bucket")
    assert(mb44 > cap, s"4x4 clique bucket must exceed the cap, got $mb44")
  }

  test("cap = 1 degenerates to the star emitter exactly") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    assert(pairSet(Dedup.minhashPairsCappedOf(d, cap = 1))
      == pairSet(Dedup.minhashPairsStarOf(d)),
      "a single resident per bucket IS the bucket canonical")
  }

  test("saturated clique: identical drop set at O(cap·n) candidate volume") {
    // one base doc + 100 near-twins, cap = 4: every doc still pairs with
    // at least one of the first-4 residents (all mutually similar), so
    // the keep-first drop set equals all-pairs' — from ≤ cap·n candidates
    // instead of n(n−1)/2
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "wanders across the wide open field toward the river looking for " +
      "something interesting to chase before the sun finally sets tonight"
    val docs = (0 to 100).map(i =>
      (i.toLong, if (i == 0) base else base + f" zzsalt$i%03d")).toDF("doc_id", "text")
    val all = pairSet(Dedup.minhashPairsOf(docs))
    val capped = pairSet(Dedup.minhashPairsCappedOf(docs, cap = 4))
    assert(drops(capped) == drops(all),
      s"keep-first drop sets must agree on the clique: ${drops(capped)} vs ${drops(all)}")
    val n = 101L
    assert(capped.size <= 4 * n,
      s"capped verified volume must stay under cap·n, got ${capped.size}")
    assert(all.size > capped.size * 2,
      s"all-pairs must pay visibly more on the clique (${all.size} vs ${capped.size})")
  }

  test("chain recall: capped drops the star-missed middle link") {
    // Construct A~B, B~C, A≁C sharing one bucket with A canonical:
    // sliding 100-token windows at offsets 0/10/20 give pairwise shingle
    // Jaccards 88/108 ≈ 0.815 (adjacent) and 78/118 ≈ 0.661 (ends) —
    // the adjacent pairs verify, the ends don't. Star pairs C only against canonical A (fails verify) so C
    // SURVIVES; all-pairs and capped (cap ≥ 2) emit (B, C) and drop it.
    // Bucket co-residency of all three depends on the hash values, so the
    // vocabulary seed was searched once and is PINNED here (re-derive after
    // a hash-function retune by re-enabling the search below: the first sd
    // in 0 until 60 where star == {(1,2)} and all == {(1,2),(2,3)}).
    //   val seed = (0 until 60).find { sd =>
    //     val star = pairSet(Dedup.minhashPairsStarOf(docsFor(sd)))
    //     val all = pairSet(Dedup.minhashPairsOf(docsFor(sd)))
    //     star == Set((1L, 2L)) && all == Set((1L, 2L), (2L, 3L))
    //   }
    def docsFor(seed: Int) = {
      def t(lo: Int, hi: Int) =
        (lo to hi).map(k => s"s${seed}w$k").mkString(" ")
      Seq((1L, t(1, 100)), (2L, t(11, 110)), (3L, t(21, 120)))
        .toDF("doc_id", "text")
    }
    val ChainSeed = 21
    val docs = docsFor(ChainSeed)
    val all = pairSet(Dedup.minhashPairsOf(docs))
    val star = pairSet(Dedup.minhashPairsStarOf(docs))
    val capped = pairSet(Dedup.minhashPairsCappedOf(docs, cap = 2))
    assert(star == Set((1L, 2L)) && all == Set((1L, 2L), (2L, 3L)),
      s"pinned seed $ChainSeed no longer produces the A~B~C chain-in-one-bucket " +
        "regime — a hash retune moved the buckets; re-derive with the search above")
    assert(drops(all) == Set(2L, 3L) && drops(star) == Set(2L),
      s"chain regime: all-pairs drops both links, star keeps the far end (${drops(star)})")
    assert(drops(capped) == Set(2L, 3L),
      s"capped must recover all-pairs' chain recall, got ${drops(capped)}")
  }

  test("starRegime: the profile verdict flips exactly when a bucket exceeds the cap") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "wanders across the wide open field toward the river looking for " +
      "something interesting to chase before the sun finally sets tonight"
    def clique(n: Int) = (0 until n).map(i =>
      (i.toLong, if (i == 0) base else base + f" zzsalt$i%03d")).toDF("doc_id", "text")
    // near-twins share every band bucket with high probability, so the
    // max bucket tracks the clique size: 100 > 64 engages, the natural
    // fixture does not
    assert(Dedup.starRegime(clique(100)),
      "a 100-twin bucket must read as the adversarial regime")
    assert(!Dedup.starRegime(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")),
      "the natural fixture must NOT engage the bounded emitter")
  }

  test("chooseEmitter: the three-rung ladder selects by profile, thresholds injectable") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "wanders across the wide open field toward the river looking for " +
      "something interesting to chase before the sun finally sets tonight"
    val sat = (0 until 100).map(i =>
      (i.toLong, if (i == 0) base else base + f" zzsalt$i%03d")).toDF("doc_id", "text")
    val natural = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    assert(Dedup.chooseEmitter(natural) == "all",
      "below the cap the exact emitter is free")
    assert(Dedup.chooseEmitter(sat) == "capped",
      "over the cap within the capped budget: the recall-preserving rung")
    assert(Dedup.chooseEmitter(sat, cappedBudget = 0L) == "star",
      "past the capped budget: the only linear rung")
  }
}
