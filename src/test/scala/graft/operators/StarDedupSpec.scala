package graft.operators

import graft.SparkSpec

/** dedup_minhash_star: the bounded pair emitter. Its oracle pins
  * cross-engine exactness; THIS suite pins the semantics vs the
  * all-pairs emitter — star pairs are a canonical-oriented SUBSET, and
  * on a duplicate-saturated cluster the keep-first DROP SET is
  * identical while the pair volume collapses from quadratic to linear.
  */
class StarDedupSpec extends SparkSpec {
  import spark.implicits._

  test("fixture: star pairs are a canonical-oriented subset of all-pairs") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val all = Dedup.minhashPairsOf(d).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    val star = Dedup.minhashPairsStarOf(d).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    assert(star.subsetOf(all),
      s"star must emit verified pairs all-pairs also emits, extras: ${star -- all}")
    assert(star.forall { case (a, b) => a < b })
  }

  test("saturated cluster: identical keep-first drop set at linear pair volume") {
    // one base doc + 40 near-twins (the salted-corpus shape): every doc
    // shares band buckets with the canonical, so star drops ALL twins —
    // the same drop set as all-pairs — from ~40 candidate pairs instead
    // of ~820
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "wanders across the wide open field toward the river looking for " +
      "something interesting to chase before the sun finally sets tonight"
    val docs = (0 to 40).map(i =>
      (i.toLong, if (i == 0) base else base + f" zzsalt$i%02d")).toDF("doc_id", "text")
    val all = Dedup.minhashPairsOf(docs).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    val star = Dedup.minhashPairsStarOf(docs).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    def drops(p: Set[(Long, Long)]) = p.map(_._2)
    assert(drops(star) == drops(all),
      s"keep-first drop sets must agree on the saturated cluster: ${drops(star)} vs ${drops(all)}")
    assert(drops(star) == (1L to 40L).toSet, "every twin drops, the canonical survives")
    assert(star.size < all.size / 4,
      s"star pair volume must collapse vs all-pairs (${star.size} vs ${all.size})")
  }
}
