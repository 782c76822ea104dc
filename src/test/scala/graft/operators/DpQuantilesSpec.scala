package graft.operators

import graft.SparkSpec

/** dp_quantiles: the noisy-histogram quantile release — single-bucket
  * exactness, bounded released-count drift, the release path's schema,
  * and noise actually firing (the mechanism isn't a no-op). */
class DpQuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("a single-bucket distribution releases its quantile exactly") {
    // 500 copies of one value: noise moves the bucket COUNT, never the
    // bucket, so every released quantile equals the true one
    val vals = Seq.fill(500)(777L).toDF("x")
    val out = CorpusOps.dpQuantiles(vals, "x").collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("released_q") == r.getAs[Long]("true_q"))
      assert(r.getAs[Long]("true_q") == 768L) // rep(bucket(777)) at b = 5
      val drift = math.abs(r.getAs[Long]("released_n") - r.getAs[Long]("true_n"))
      assert(drift <= 31L, s"one bucket's geometric noise is <= 31, got $drift")
    }
  }

  test("released counts drift by at most 31 per occupied bucket; noise fires") {
    val vals = (1 to 4000).map(i => (i.toLong * 7919L) % 1000000L).toDF("x")
    val buckets = vals
      .selectExpr(s"${CorpusOps.hdrBucketExpr("x", 5)} AS bkt")
      .distinct().count()
    val out = CorpusOps.dpQuantiles(vals, "x").collect()
    out.foreach { r =>
      val (tn, rn) = (r.getAs[Long]("true_n"), r.getAs[Long]("released_n"))
      assert(math.abs(rn - tn) <= 31L * buckets)
      assert(r.getAs[Long]("released_q") > 0L)
    }
    // the mechanism must not be a silent no-op: across the occupied
    // buckets at least one draw is nonzero (P[all zero] ~ (1/2)^buckets)
    assert(out.exists(r =>
      r.getAs[Long]("released_n") != r.getAs[Long]("true_n")),
      "geometric noise never fired across the histogram")
  }

  test("withTrue = false is the release path: no true columns") {
    val vals = Seq.fill(50)(123L).toDF("x")
    val rel = CorpusOps.dpQuantiles(vals, "x", withTrue = false)
    assert(rel.columns.toSeq == Seq("q_pm", "released_n", "released_q"))
    assert(rel.count() == 3)
  }
}
