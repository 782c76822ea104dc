package graft.operators

import graft.SparkSpec
import graft.functions.{Portable, TestHashAccess}

/** In-JVM model check for the hashed linear quality classifier: the
  * expected weight table and every doc score are recomputed in plain
  * Scala from the SAME native token hashes, so a regression in the
  * bucket arithmetic, the Laplace smoothing, the full-domain weight
  * join, or the trunc-division mean fails with an exact numeric diff.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val B = 8192
  private def buckets(text: String): Seq[Long] = {
    val th = TestHashAccess.tokenHashes(text).toSeq
    if (th.size < 2) Nil
    else th.sliding(2).map { case Seq(a, b) =>
      ((a * Portable.MIX + b) % Portable.P) % B
    }.toSeq
  }

  // two separable vocabularies with one shared ambiguous token pair
  private val corpus = Seq(
    (0L, "good clean prose reads well and flows", "en"),
    (1L, "good clean prose flows well again here", "en"),
    (2L, "zz qq spam junk noise junk spam qq", "xx"),
    (3L, "qq zz junk noise spam noise zz qq", "xx"),
    (4L, "good clean prose and well formed text", "en"),
    (5L, "spam junk zz qq noise zz junk spam", "xx"),
    (6L, "solo", "en")) // < 2 tokens: no features, drops from scoring

  private lazy val docs = corpus
    .map { case (id, t, l) => (id, t, l, "s", t.length.toLong) }
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("weights and scores match the in-JVM closed-form model exactly") {
    // JVM model: train on doc_id % 2 = 0, positive = lang 'en'
    val train = corpus.filter(_._1 % 2 == 0)
    val posB = train.filter(_._3 == "en").flatMap(d => buckets(d._2))
    val negB = train.filter(_._3 != "en").flatMap(d => buckets(d._2))
    val pc = posB.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nc = negB.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (ptot, ntot) = (posB.size.toLong, negB.size.toLong)
    def w(b: Long): Long =
      ((pc.getOrElse(b, 0L) + 1L) * 1000000000L) / (ptot + B) -
        ((nc.getOrElse(b, 0L) + 1L) * 1000000000L) / (ntot + B)
    val weights = CorpusOps.trainHashedClassifier(
      docs.filter("doc_id % 2 = 0"), posExpr = "lang = 'en'")
    val got = weights.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == B, s"weight table must be exactly B rows, got ${got.size}")
    (0L until B).foreach(b => assert(got(b) == w(b),
      s"bucket $b: got ${got(b)}, want ${w(b)}"))
    // per-doc scores: trunc-toward-zero mean of bucket weights
    val scored = CorpusOps.hashedClassifierScore(docs, weights).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getInt(4)))
    val expected = corpus.filter(d => buckets(d._2).nonEmpty).map { d =>
      val bs = buckets(d._2)
      val mean = bs.map(w).sum / bs.size // Long division: trunc toward zero
      (d._1, bs.size.toLong, mean, if (mean > 0) 1 else 0)
    }
    assert(scored.toSeq == expected,
      s"scores diverge from the JVM model:\n${scored.toSeq}\n$expected")
    // the separable vocabulary separates: every en doc keeps, no xx doc does
    val keepByDoc = scored.map(s => s._1 -> s._4).toMap
    assert(Seq(0L, 1L, 4L).forall(keepByDoc(_) == 1) &&
      Seq(2L, 3L, 5L).forall(keepByDoc(_) == 0),
      s"classifier fails to separate the constructed classes: $keepByDoc")
    assert(!keepByDoc.contains(6L), "a featureless doc drops from scoring")
  }

  test("classifierEval: confusion counts and per-mille metrics match the JVM model on the held-out half") {
    val weights = CorpusOps.trainHashedClassifier(
      docs.filter("doc_id % 2 = 0"), posExpr = "lang = 'en'")
    val heldOut = CorpusOps.hashedClassifierScore(
      docs.filter("doc_id % 2 = 1"), weights)
    val got = CorpusOps.classifierEval(heldOut, labelExpr = "lang = 'en'")
      .collect().head
    // JVM model over the held-out docs (1, 3, 5 — doc 6's 'solo' has no
    // features and is absent from the scored frame, so it never counts)
    val scored = heldOut.collect()
      .map(r => (r.getString(1) == "en", r.getInt(4) == 1))
    val tp = scored.count(s => s._1 && s._2).toLong
    val fp = scored.count(s => !s._1 && s._2).toLong
    val fn = scored.count(s => s._1 && !s._2).toLong
    val tn = scored.count(s => !s._1 && !s._2).toLong
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) == (tp + fp + fn + tn, tp, fp, fn, tn))
    assert(got.getLong(5) == (if (tp + fp == 0) 0L else tp * 1000 / (tp + fp)))
    assert(got.getLong(6) == (if (tp + fn == 0) 0L else tp * 1000 / (tp + fn)))
    // the separable fixture separates out-of-sample too
    assert(got.getLong(7) == 1000L, s"held-out accuracy must be 1000 pm, got $got")
  }

  test("thresholdPpb is a real knob: raising it past the best score keeps nothing") {
    val weights = CorpusOps.trainHashedClassifier(
      docs.filter("doc_id % 2 = 0"), posExpr = "lang = 'en'")
    val maxScore = CorpusOps.hashedClassifierScore(docs, weights)
      .agg(org.apache.spark.sql.functions.max("score_ppb")).head.getLong(0)
    val none = CorpusOps.hashedClassifierScore(docs, weights, thresholdPpb = maxScore)
      .filter("keep = 1").count()
    assert(none == 0, "threshold at the max score must keep nothing")
  }
}
