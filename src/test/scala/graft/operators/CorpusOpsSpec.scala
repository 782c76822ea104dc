package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.types._

/** Edge cases + plan shape for the corpus-hygiene operators. The value
  * semantics are oracle-checked at sf0.01; this spec covers what the
  * fixture can't reach (pre-existing PII in the text, sub-shingle docs,
  * exact chunk boundaries) and pins the physical-plan claims from the
  * CorpusOps scaladoc (map-side ops stay shuffle-free, the heavy-shingle
  * join broadcasts, top-k plans TakeOrdered).
  */
class CorpusOpsSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = tmpDir("corpusops")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val boiler = "the quick brown fox jumps" // shared 5-token shingle
    // sources skewed 5:2 so mix_rebalance must downsample "a" and keep "b"
    val docs = Seq(
      Row(0L, s"$boiler alpha", "en", "a", 31L),
      Row(1L, s"$boiler beta", "en", "a", 30L),
      Row(2L, s"$boiler gamma", "en", "a", 31L), // 3 docs -> df>=3 -> boilerplate
      Row(3L, "tiny doc", "en", "a", 8L),        // < 5 tokens: no shingles
      Row(4L, "mail me at spy@evil.example.org now", "en", "a", 35L), // PII already in text
      Row(5L, "x" * 256, "en", "b", 256L),       // exact chunk boundary
      Row(6L, "y" * 192, "en", "b", 192L),       // exactly one stride
      // doc 10 (doc_id % 10 == 0 -> "new batch" for dedup_incremental) is
      // an exact twin of historical doc 1: must flag exact AND near
      Row(10L, s"$boiler beta", "en", "b", 30L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs, 1), docSchema)
      .write.parquet(s"$d/documents.parquet")
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    // vec_ids 0-3 are the IVF seed centroids (near-orthogonal); 4-7 sit
    // close to centroid 0 or 1, so cell membership is unambiguous
    val embs = Seq(
      Row(0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      Row(1L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 0),
      Row(2L, Seq(0.0f, 0.0f, 1.0f, 0.0f), 1),
      Row(3L, Seq(0.0f, 0.0f, 0.0f, 1.0f), 1),
      Row(4L, Seq(0.9f, 0.1f, 0.0f, 0.0f), 0),   // cell 0
      Row(5L, Seq(0.8f, 0.2f, 0.0f, 0.0f), 0),   // cell 0
      Row(6L, Seq(0.1f, 0.9f, 0.0f, 0.0f), 1),   // cell 1
      Row(7L, Seq(0.2f, 0.8f, 0.1f, 0.0f), 1))   // cell 1
    spark.createDataFrame(
      spark.sparkContext.parallelize(embs, 1), embSchema)
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)
  private def run2(name: String, d: String) = SparkEntry.queries(name)(spark, d)

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("pii_redact: pre-existing email in the text is scrubbed alongside the payload") {
    val r = run("pii_redact").collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(4L).getAs[Long]("n_emails") == 2L,
      "doc 4 carries its own email plus the synthetic payload one")
    assert(r(0L).getAs[Long]("n_emails") == 1L)
    assert(r(0L).getAs[Long]("n_phones") == 1L && r(0L).getAs[Long]("n_ips") == 1L)
  }

  test("boilerplate_flag: shared shingle across 3 docs flags them; sub-shingle doc is clean") {
    val r = run("boilerplate_flag").collect()
      .map(x => (x.getAs[Long]("doc_id"),
        (x.getAs[Long]("n_shingles"), x.getAs[Long]("n_boiler"),
          x.getAs[Int]("flagged")))).toMap
    // docs 0-2: 2 shingles each ("the quick brown fox jumps", "quick brown
    // fox jumps <suffix>"); only the first repeats across docs
    Seq(0L, 1L, 2L).foreach { id =>
      assert(r(id) == ((2L, 1L, 1)), s"doc $id: half its shingles are boilerplate")
    }
    assert(r(3L) == ((0L, 0L, 0)), "a < 5-token doc has no shingles and a zero frac, not a crash")
  }

  test("ngram_top_corpus: counts and deterministic tie-break") {
    val top = run("ngram_top_corpus").collect()
      .map(x => x.getAs[String]("bigram") -> x.getAs[Long]("cnt"))
    // four bigrams tie at count 4; the deterministic tie-break puts the
    // lexicographically smallest first
    assert(top.head == ("brown fox" -> 4L))
    val counts = top.toMap
    Seq("the quick", "quick brown", "brown fox", "fox jumps").foreach { b =>
      assert(counts(b) == 4L, s"bigram '$b' appears once in each of docs 0-2 and 10")
    }
    // ties are ordered lexicographically: stable across runs/engines
    val byCount = top.groupBy(_._2).values
    byCount.foreach(g =>
      assert(g.map(_._1).toSeq == g.map(_._1).toSeq.sorted))
  }

  test("chunk_text: exact-boundary and single-stride docs chunk correctly, no contained tails") {
    val r = run("chunk_text").collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Int]("chunk_idx")) ->
        x.getAs[Long]("chunk_len")).toMap
    // 256 chars: ONE chunk covers the whole doc — a second chunk at start
    // 193 would be wholly contained in the first (double-counted content)
    assert(r((5L, 0)) == 256L && !r.contains((5L, 1)))
    // 192 chars: a single chunk of the full doc
    assert(r((6L, 0)) == 192L && !r.contains((6L, 1)))
  }

  test("chunk_text: every chunk past the first adds content beyond the previous window") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val d2 = tmpDir("chunklen")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    // lengths straddling every boundary: 1, 64, 65, 255, 256, 257 (first
    // length needing 2 chunks), 448 (2nd chunk ends exactly at EOF), 449
    val lens = Seq(1, 64, 65, 255, 256, 257, 448, 449)
    val rows = lens.zipWithIndex.map { case (n, i) =>
      Row(i.toLong, "z" * n, "en", "s", n.toLong)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.parquet(s"$d2/documents.parquet")
    val out = run2("chunk_text", d2).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("chunk_idx"))
        .map(_.getAs[Long]("chunk_len")).toSeq).toMap
    val expect = Map(
      0L -> Seq(1L), 1L -> Seq(64L), 2L -> Seq(65L), 3L -> Seq(255L),
      4L -> Seq(256L),
      5L -> Seq(256L, 65L),      // 257: tail chunk reaches the new char
      6L -> Seq(256L, 256L),     // 448: second window ends exactly at EOF
      7L -> Seq(256L, 256L, 65L))
    assert(out == expect, s"got $out")
  }

  test("mix_rebalance: over-represented source is rate-limited, under-represented keeps all") {
    val r = run("mix_rebalance").collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("keep_m"), x.getAs[Long]("n_kept"))).toMap
    // total 8, 2 sources -> target 4/source: a (5 docs) -> 800 permille,
    // b (3 docs) -> capped at 1000 (never up-samples)
    assert(r("a") == ((5L, 800L, r("a")._3)) && r("a")._3 <= 5L)
    assert(r("b") == ((3L, 1000L, 3L)), "keep_m is capped at 1000: every b doc survives")
  }

  test("ann_ivf_probe: results stay in the query's cell, self excluded, ranks contiguous") {
    val rows = run("ann_ivf_probe").collect()
    assert(rows.nonEmpty)
    rows.foreach { x =>
      assert(x.getAs[Long]("vec_id") != x.getAs[Long]("q_id"), "self match must be excluded")
      assert(!x.getAs[Double]("cosine").isNaN)
    }
    // every (q_id) group: one cell value, ranks 1..n ordered by cosine desc
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("cell")).distinct.size == 1,
        "nprobe=1: all results come from the query's own cell")
      val byRank = g.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to g.size).toSeq)
      val cos = byRank.map(_.getAs[Double]("cosine")).toSeq
      assert(cos == cos.sorted.reverse, "ranks follow cosine descending")
    }
    // vectors 4,5 sit by centroid 0 and 6,7 by centroid 1: querying 4 must
    // find 5 (same cell) and never 6/7
    val q4 = rows.filter(_.getAs[Long]("q_id") == 4L).map(_.getAs[Long]("vec_id")).toSet
    assert(q4.contains(5L) && !q4.contains(6L) && !q4.contains(7L))
  }

  test("dedup_incremental: a batch doc twinning a historical doc flags exact+near, others keep") {
    val r = run("dedup_incremental").collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Int]("exact_dup"), x.getAs[Int]("near_dup"), x.getAs[Int]("keep"))).toMap
    // the batch is doc_ids 0 and 10 (doc_id % 10 == 0)
    assert(r.keySet == Set(0L, 10L))
    assert(r(10L) == ((1, 1, 0)),
      "doc 10 is an exact twin of historical doc 1: exact (digest) AND near (jaccard 1.0)")
    // doc 0 shares 3 of 5 shingles with docs 1/2 (jaccard 0.6 < 0.8): kept
    assert(r(0L) == ((0, 0, 1)))
  }

  test("importance_hashed: full frame matches an independent in-JVM model; short docs drop") {
    val d = tmpDir("imphash")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val docs = Seq(
      Row(0L, "alpha beta alpha beta alpha beta", "en", "w", 32L),
      Row(1L, "alpha beta gamma", "en", "w", 16L),
      Row(2L, "zeta eta theta", "de", "w", 14L), // bigrams unseen in target
      Row(3L, "solo", "en", "w", 4L),            // 1 token: no bigrams -> absent
      Row(4L, "", "en", "w", 0L))                // empty -> absent
    spark.createDataFrame(spark.sparkContext.parallelize(docs, 1), docSchema)
      .write.parquet(s"$d/documents.parquet")

    // independent model: plain-Scala polyhash + bucket arithmetic, not the
    // Catalyst expression path the operator rides
    import graft.functions.Portable.{MIX, P}
    def ph(t: String): Long = t.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % P)
    def bks(s: String): Seq[Long] = {
      val th = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).map(ph)
      (1 until th.length).map(i => ((th(i - 1) * MIX + th(i)) % P) % 8192L)
    }
    val corpus = docs.map(r => (r.getLong(0), r.getString(2), bks(r.getString(1))))
    val sc = corpus.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tc = corpus.filter(_._2 == "en").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def w(b: Long): Long = ((tc.getOrElse(b, 0L) + 1L) * 1000000L) / (sc(b) + 1L)
    val expected = corpus.filter(_._3.nonEmpty).map { case (id, lang, bs) =>
      val score = bs.map(w).sum
      (id, lang, bs.size.toLong, score, score / bs.size)
    }.sortBy(_._1)

    val got = run2("importance_hashed", d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected, s"got $got, expected $expected")
    // and the target-typical doc outranks the out-of-target doc per-bigram
    val byId = got.map(r => r._1 -> r._5).toMap
    assert(byId(0L) > byId(2L),
      "a doc made of target-frequent bigrams must score above one with target-unseen bigrams")
  }

  test("corpus_diversity: full frame matches an independent in-JVM distinct-n model") {
    val d = tmpDir("corpdiv")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val docs = Seq(
      Row(0L, "cat cat cat cat", "en", "templ", 15L),  // 1 distinct unigram
      Row(1L, "cat cat cat", "en", "templ", 11L),      // repeats across docs too
      Row(2L, "cat dog fish bird", "en", "organic", 17L), // all distinct
      Row(3L, "dog fish", "en", "organic", 8L),      // bigram unseen, unigrams repeat
      Row(4L, "solo", "en", "tiny", 4L),             // no bigrams/trigrams rows
      Row(5L, "", "en", "emptysrc", 0L))             // no rows at all
    spark.createDataFrame(spark.sparkContext.parallelize(docs, 1), docSchema)
      .write.parquet(s"$d/documents.parquet")

    // independent model: plain-Scala polyhash + the paired 60-bit chain,
    // not the Catalyst expression path the operator rides
    import graft.functions.Portable.{MIX, MIX2, P, P2}
    def ph(t: String): Long = t.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % P)
    def fps(s: String): Seq[(Int, Long)] = {
      val th = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).map(ph).toSeq
      def chain(g: Seq[Long], mix: Long, m: Long): Long =
        g.reduceLeft((a, b) => (a * mix + b) % m)
      val grams = th.map(Seq(_)) ++ th.sliding(2).filter(_.size == 2) ++
        th.sliding(3).filter(_.size == 3)
      grams.map { g =>
        // n = 1 decorrelates the pair with (x*MIX2) % P2 (a bare second
        // chain would collapse to the first); n >= 2 folds both chains
        val b = if (g.size == 1) (g.head * MIX2) % P2 else chain(g, MIX2, P2)
        (g.size, chain(g, MIX, P) * 2147483648L + b)
      }
    }
    val all = docs.flatMap(r => fps(r.getString(1)).map { case (n, fp) =>
      (r.getString(3), n, fp)
    })
    val expected = all.groupBy(t => (t._1, t._2)).map { case ((src, n), g) =>
      val total = g.size.toLong
      val distinct = g.map(_._3).distinct.size.toLong
      (src, n, total, distinct, distinct * 1000000L / total)
    }.toSeq.sortBy(t => (t._1, t._2))

    val got = run2("corpus_diversity", d).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected, s"got $got, expected $expected")
    // the semantic reading: the templated source's distinct ratios sit
    // BELOW the organic source's at every n that exists for both
    val ppm = got.map(r => (r._1, r._2) -> r._5).toMap
    for (n <- 1 to 3)
      assert(ppm(("templ", n)) < ppm(("organic", n)),
        s"templated source must read less diverse at n=$n")
    // unigram-only doc emits no n>=2 rows; empty text emits nothing
    assert(!got.exists(r => r._1 == "tiny" && r._2 > 1))
    assert(!got.exists(_._1 == "emptysrc"))
  }

  test("source_drift: full frame matches an independent in-JVM TVD model; identical sources read zero") {
    val d = tmpDir("srcdrift")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val docs = Seq(
      // a and b are IDENTICAL corpora (same bigram multiset), c diverges
      Row(0L, "alpha beta gamma delta", "en", "a", 22L),
      Row(1L, "alpha beta gamma delta", "en", "b", 22L),
      Row(2L, "omega psi chi phi omega psi", "en", "c", 26L),
      Row(3L, "solo", "en", "d", 4L)) // 1 token: no bigrams -> source drops
    spark.createDataFrame(spark.sparkContext.parallelize(docs, 1), docSchema)
      .write.parquet(s"$d/documents.parquet")

    // independent model: plain-Scala polyhash + TVD arithmetic
    import graft.functions.Portable.{MIX, P}
    def ph(t: String): Long = t.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % P)
    def bks(s: String): Seq[Long] = {
      val th = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).map(ph)
      (1 until th.length).map(i => ((th(i - 1) * MIX + th(i)) % P) % 8192L)
    }
    val bySrc = docs.map(r => r.getString(3) -> bks(r.getString(1)))
      .groupBy(_._1).view.mapValues(_.flatMap(_._2)).toMap
      .filter(_._2.nonEmpty)
    val all = bySrc.values.flatten.toSeq
    val n = all.size.toLong
    val cb = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = bySrc.toSeq.sortBy(_._1).flatMap { case (src, bs) =>
      val ns = bs.size.toLong
      val nr = n - ns
      if (nr == 0) None else {
        val o = bs.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val sd = cb.keys.toSeq.map { b =>
          val ob = o.getOrElse(b, 0L)
          math.abs(ob * 1000000000L / ns - (cb(b) - ob) * 1000000000L / nr)
        }.sum
        Some((src, ns, nr, sd / 2))
      }
    }
    val got = run2("source_drift", d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"got $got, expected $expected")
    // structural reads: the 1-token source is absent; the identical pair
    // drifts LESS from the rest than the divergent source
    assert(!got.exists(_._1 == "d"), "a source with no bigrams has no distribution")
    val byName = got.map(r => r._1 -> r._4).toMap
    assert(byName("c") > byName("a"),
      "the divergent source must read more drift than a source mirrored in the rest")
  }

  test("corpus_stats: rollup levels are consistent and the grand total is exact") {
    val rows = run("corpus_stats").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    val lvl0 = rows.filter(_._1 == 0)
    val lvl1 = rows.filter(_._1 == 1)
    val lvl3 = rows.filter(_._1 == 3)
    assert(lvl3.length == 1 && lvl3.head._2 == "__all__" && lvl3.head._3 == "__all__",
      "exactly one grand-total row")
    assert(rows.count(_._1 == 2) == 0, "rollup(source, lang) never aggregates source alone")
    // per-source subtotals are the sums of their (source, lang) rows
    lvl1.foreach { s =>
      val parts = lvl0.filter(_._2 == s._2)
      assert(parts.map(_._4).sum == s._4, s"doc subtotal for ${s._2}")
      assert(parts.map(_._5).sum == s._5, s"token subtotal for ${s._2}")
      assert(parts.map(_._6).sum == s._6, s"char subtotal for ${s._2}")
      assert(parts.map(_._7).min == s._7 && parts.map(_._8).max == s._8,
        s"extremes for ${s._2}")
    }
    // grand total ties out against the subtotals and the integer mean rule
    assert(lvl1.map(_._4).sum == lvl3.head._4 && lvl1.map(_._5).sum == lvl3.head._5)
    rows.foreach(r => assert(r._6 / r._4 == r._9, s"avg_chars is tot div n for $r"))
  }

  test("plan: map-side ops are shuffle-free; heavy join broadcasts; top-k is TakeOrdered") {
    Seq("pii_redact", "chunk_text").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q is a per-row transform and must not shuffle")
    }
    val b = plan("boilerplate_flag")
    assert(b.contains("BroadcastHashJoin"), "heavy-shingle set joins back broadcast")
    assert(b.toLowerCase.contains("partial_count"), "doc-frequency count is partial+final")
    val n = plan("ngram_top_corpus")
    assert(n.contains("TakeOrderedAndProject"), "top-20 must not globally sort")
    assert(n.toLowerCase.contains("partial_count"))
  }

  test("snapshotDiff: every status on a constructed two-version corpus, null-safe digests") {
    import spark.implicits._
    // v1: docs 1..4 (+6 with null text); v2 drops 2, adds 5, revises 3,
    // keeps 1 and 4 byte-identical, keeps 6 null-text (null <=> null =
    // unchanged — two absent texts are the same absence)
    def mk(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "text", "source")
    val v1 = mk(Seq((1L, "alpha", "s1"), (2L, "beta", "s1"),
      (3L, "gamma", "s2"), (4L, "delta", "s2"), (6L, null, "s3")))
    val v2 = mk(Seq((1L, "alpha", "s1"), (3L, "gamma revised", "s2"),
      (4L, "delta", "s2"), (5L, "epsilon", "s3"), (6L, null, "s3")))
    val out = CorpusOps.snapshotDiff(v1, v2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, "s1", "unchanged"), (2L, "s1", "removed"), (3L, "s2", "changed"),
      (4L, "s2", "unchanged"), (5L, "s3", "added"), (6L, "s3", "unchanged")),
      s"diff mismatch: ${out.toSeq}")
  }
}
