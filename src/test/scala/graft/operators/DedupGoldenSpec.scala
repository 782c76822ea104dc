package graft.operators

import graft.SparkSpec
import graft.functions.Portable

/** Golden vectors for the cluster-consuming curation operators over a
  * crafted corpus: one near-dup pair where the HIGHER-QUALITY member is
  * NOT the min-id (so keep-best provably differs from min-id selection),
  * plus singletons, plus an exact-copy pair in the same media class for
  * the pHash grouping. */
class DedupGoldenSpec extends SparkSpec {
  import spark.implicits._

  // 80 tokens: BELOW the 100-token saturation of text_quality's length
  // term, so the 8 extra tokens raise doc 2's quality strictly
  private val base = (1 to 40).map(i => s"tok$i word$i").mkString(" ")
  // superset doc: same text plus fresh tokens — jaccard vs base 0.907
  // (well over the 0.8 gate) but MORE tokens and MORE distinct tokens,
  // so text_quality scores it strictly higher. Token choice matters: the
  // affine minhash permutations share one near-wrap point (x ~ P61/a), so
  // a new shingle hashing just above it would claim EVERY lane minimum at
  // once and break banding recall — these extras were checked to leave
  // all 4 band keys intact (an "extra1..8" suffix did not).
  private val richer = base + " " + (1 to 8).map(i => s"q0z$i").mkString(" ")

  private def fixture(): String = {
    val dir = tmpDir("dedupgold")
    Seq(
      (1L, base, "en", "web"),
      (2L, richer, "en", "web"),                       // near-dup of 1, higher quality
      (3L, "an unrelated short document about graphs", "en", "web"),
      (6L, "an unrelated short document about graphs", "en", "web")) // exact copy of 3, same media class (both % 3 == 0)
      .map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("minhash_calibration: exact copies calibrate to zero error; estimator is the lane fraction") {
    val dir = fixture()
    val out = graft.SparkEntry.queries("minhash_calibration")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val byPair = out.map(r => (r._1, r._2) -> r).toMap
    val ex = byPair((3L, 6L))
    assert(ex._3 == 16L && ex._4 == 1000L && ex._5 == 1000L && ex._6 == 0L,
      s"identical docs must agree on every lane with zero calibration error: $ex")
    val near = byPair((1L, 2L))
    assert(near._5 >= 800L && near._5 < 1000L,
      s"the near-dup pair's exact jaccard sits in the [0.8, 1.0) band: $near")
    out.foreach { r =>
      assert(r._4 == (r._3 * 1000) / 16, s"estimator must be the lane fraction: $r")
      assert(r._6 == math.abs(r._4 - r._5), s"error column must tie out: $r")
    }
  }

  test("minhash_band_sweep: full (split × emitter) grid; monotone all-pairs; 4x4 ties to calibration") {
    val dir = fixture()
    val rows = graft.SparkEntry.queries("minhash_band_sweep")(spark, dir)
      .as[(Long, Long, String, Long, Long, Long)].collect().toSeq
    // one row per (split, emitter) grid point, (bands, emitter) ascending
    assert(rows.map(r => (r._1, r._3)) ==
      (for (b <- Seq(2L, 4L, 8L); e <- Seq("all", "capped", "star")) yield (b, e)),
      s"one row per sweep config per emitter: $rows")
    // width-w bands split exactly into width-w/2 bands, so a pair sharing
    // a wide band shares both halves: ALL-PAIRS candidates are SUPERSETS
    // as width shrinks — n_candidates nondecreasing in bands (the bounded
    // emitters re-pick canonicals/residents per split, so only weak
    // bounds apply to them: star ≤ capped ≤ all per split)
    val all = rows.filter(_._3 == "all").map(_._4)
    assert(all == all.sorted, s"all-pairs volume must grow with band count: $rows")
    rows.groupBy(_._1).foreach { case (b, rs) =>
      val byEm = rs.map(r => r._3 -> r._4).toMap
      assert(byEm("star") <= byEm("capped") && byEm("capped") <= byEm("all"),
        s"ladder ordering must hold within split $b: $rs")
      // this fixture's buckets hold ≤ 2 residents, far under the cap —
      // the three emitters must coincide exactly (a 2-bucket's star pair
      // IS its all pair), the degenerate end of the containment spec
      assert(byEm("star") == byEm("all"),
        s"≤2-resident buckets: emitters must coincide at split $b: $rs")
    }
    // the exact-copy pair (3, 6) agrees on every lane — it is a candidate
    // at every grid point, with est 1000
    assert(rows.forall(_._4 >= 1L), s"the exact-copy pair must surface everywhere: $rows")
    assert(rows.forall(_._6 >= 1L), s"est >= 0.5 must include the exact pair everywhere: $rows")
    // the (4, 4, all) row measures the SAME candidate set
    // minhash_calibration reports per-pair — the counts must tie out
    val calPairs = graft.SparkEntry.queries("minhash_calibration")(spark, dir).count()
    assert(rows.find(r => r._1 == 4L && r._3 == "all").get._4 == calPairs,
      "the 4x4 all-pairs sweep row and the calibration pair frame must see one candidate set")
  }

  test("dedup_cluster_stats: histogram ties out against the per-doc cluster frame") {
    val dir = fixture()
    val stats = graft.SparkEntry.queries("dedup_cluster_stats")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    val clusters = graft.SparkEntry.queries("dedup_clusters")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    val nTotal = 4L
    // every doc is accounted for exactly once: clustered docs in their
    // size rows, the rest in the singleton row
    assert(stats.map(_._3).sum == nTotal, s"n_docs must partition the corpus: $stats")
    // multiplicity invariant for real clusters: n_docs = size x n_clusters
    stats.filter(_._1 >= 2L).foreach { r =>
      assert(r._3 == r._1 * r._2, s"cluster_size x n_clusters != n_docs in $r")
    }
    // recompute the histogram from the per-doc frame — must match exactly
    val fromFrame = clusters.groupBy(_._2).map(_._2.size.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    stats.filter(_._1 >= 2L).foreach { r =>
      assert(fromFrame.getOrElse(r._1, 0L) == r._2, s"histogram row $r disagrees with dedup_clusters")
    }
    val singleton = stats.find(_._1 == 1L).get
    assert(singleton._2 == nTotal - clusters.length,
      s"singleton count must be corpus minus clustered docs: $singleton vs ${clusters.length}")
  }

  test("dedup_keep_best: the higher-quality member wins, not the min id") {
    val dir = fixture()
    val out = graft.SparkEntry.queries("dedup_keep_best")(spark, dir)
      .selectExpr("cluster_id", "cluster_size", "kept_doc", "n_dropped")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 2L, 1L), (3L, 2L, 3L, 1L)),
      s"cluster {1,2} must keep richer doc 2 (min-id selection would keep 1); " +
        s"the exact-copy cluster {3,6} ties to min id 3; got $out")
  }

  test("split_leakage_safe: cluster members share the canonical id and split; singletons self-canonical") {
    val dir = fixture()
    val out = graft.SparkEntry.queries("split_leakage_safe")(spark, dir)
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    val byDoc = out.map(r => r._1 -> r).toMap
    assert(byDoc(1L)._2 == 1L && byDoc(2L)._2 == 1L,
      s"near-dups 1 and 2 canonicalize to cluster id 1, got $out")
    assert(byDoc(1L)._3 == byDoc(2L)._3, "near-dups can never straddle splits")
    // exact copies 3 and 6 are ALSO minhash near-dups -> same canon
    assert(byDoc(3L)._2 == 3L && byDoc(6L)._2 == 3L && byDoc(3L)._3 == byDoc(6L)._3)
    // the split matches the documented hash, computed independently here
    def split(canon: Long): String = {
      val b = ((canon % 999983L) * Portable.MIX + 7919L) % 100L
      if (b < 90) "train" else if (b < 95) "val" else "test"
    }
    out.foreach { case (_, canon, s) => assert(s == split(canon)) }
  }

  test("dedup_ngram_jaccard: a >50-copy near-identical cluster stays witnessed (hub tier, no recall cliff)") {
    import spark.implicits._
    // 60 near-identical docs: identical 240-char base + a 3-char unique
    // suffix (gram jaccard ~ 0.94, same lang, same length band). Under a
    // plain df <= 50 drop every bucket key the cluster shares would
    // vanish at once and the heaviest duplicate cluster would emit ZERO
    // pairs; the hub tier must keep every member witnessed.
    val dir = tmpDir("ngramhub")
    val base = (1 to 40).map(i => f"tok$i%02d").mkString(" ") // 240 chars
    (1L to 60L).map(i => (i, f"$base v$i%02d", "en", "web"))
      .map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
      .selectExpr("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "the cluster must not be silently dropped")
    val witnessed = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(witnessed == (1L to 60L).toSet,
      s"every member of the 60-copy cluster must appear in a pair; missing ${(1L to 60L).toSet -- witnessed}")
  }

  test("multimodal_phash_dedup: exact copies in one media class form one group") {
    val dir = fixture()
    val out = graft.SparkEntry.queries("multimodal_phash_dedup")(spark, dir)
      .selectExpr("media_type", "group_size", "canonical_id")
      .as[(String, Long, Long)].collect().toSeq
    // docs 3 and 6 are byte-identical and both doc_id % 3 == 0 ('image');
    // docs 1 and 2 differ in media class (1 -> audio, 2 -> video) so their
    // near-dup hashes cannot group across classes
    assert(out == Seq(("image", 2L, 3L)), s"got $out")
  }
}
