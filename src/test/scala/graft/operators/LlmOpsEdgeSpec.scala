package graft.operators

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Edge cases the parquet-fixture oracle can't reach: empty/one-token
  * documents through the repetition scorer, a document landing exactly on
  * a pack boundary, zero and single-element vectors through the int8
  * quantizer, and rarity beating frequency in TF-IDF ranking. The spec
  * writes a miniature documents/embeddings parquet pair shaped like the
  * driver fixtures and drives the registered queries against it.
  */
class LlmOpsEdgeSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = tmpDir("llmedge")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val docs = Seq(
      // doc 0: pool member for decontamination (doc_id % 97 == 0), shares
      // its only shingle with doc 1
      Row(0L, "alpha beta gamma delta epsilon", "en", "s", 4096L),
      Row(1L, "alpha beta gamma delta epsilon zeta", "en", "s", 4096L),
      Row(2L, "", "en", "s", 1L),                       // empty text
      Row(3L, "one", "en", "s", 3L),                    // single token: no bigrams
      Row(4L, "a a a a a", "en", "s", 9L),              // maximal repetition
      Row(5L, "rare unique words here now", "en", "s", 100L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs, 1), docSchema)
      .write.parquet(s"$d/documents.parquet")
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val embs = Seq(
      Row(0L, Seq(0.0f, 0.0f, 0.0f), 0),                // zero vector (scale guard)
      Row(1L, Seq(1.0f), 0),                            // single element, exact scale
      Row(2L, Seq(0.5f, -1.0f, 0.25f), 1),
      Row(3L, Seq.empty[Float], 1))                     // empty vector: excluded, not a crash
    spark.createDataFrame(
      spark.sparkContext.parallelize(embs, 1), embSchema)
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("text_repetition: empty and single-token docs score 0; pure repetition flags") {
    val rows = run("text_repetition").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("dup_token_frac"),
          r.getAs[Double]("dup_bigram_frac"), r.getAs[Int]("is_repetitive"))).toMap
    assert(rows(2L) == ((0L, 0.0, 0.0, 0)), "empty text is a clean zero, not a crash/NaN")
    assert(rows(3L) == ((1L, 0.0, 0.0, 0)), "one token: no bigrams, nothing duplicated")
    val (n4, dt4, db4, flag4) = rows(4L)
    // 5 tokens / 1 distinct -> 4/5; 4 bigrams ("a_a" x4) / 1 distinct -> 3/4
    assert(n4 == 5L && dt4 == 0.8 && db4 == 0.75 && flag4 == 1,
      s"'a a a a a': expected dup fractions 0.8/0.75, got $dt4/$db4")
    assert(rows(5L)._4 == 0, "all-distinct text is not repetitive")
  }

  test("pack_sequences: a doc landing exactly on the boundary opens the next pack") {
    val packs = run("pack_sequences").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pack_id")).toMap
    // docs 0 and 1 are both n_chars=4096 in the same (lang, shard):
    // doc 0 fills pack 0 completely, doc 1 must start pack 1
    assert(packs(0L) == 0L && packs(1L) == 1L,
      s"expected boundary doc to open the next pack, got $packs")
  }

  test("embedding_quantize: zero vector survives the scale guard; unit scale is exact") {
    val rows = run("embedding_quantize").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("q_sum"), r.getAs[Long]("q_first"), r.getAs[Double]("max_err"))).toMap
    assert(rows(0L) == ((0L, 0L, 0.0)), "zero vector quantizes to all-zero, zero error")
    assert(rows(1L) == ((127L, 127L, 0.0)), "1.0 with maxabs=1.0 is exactly q=127")
    val (_, _, err2) = rows(2L)
    // reconstruction error bound: half a quantization step = maxabs/127/2
    assert(err2 <= 1.0 / 127.0 / 2.0 + 1e-12, s"max_err $err2 exceeds half a step")
    assert(!rows.contains(3L), "empty vector is excluded (ANSI element_at would throw)")
  }

  test("tfidf_top_terms: corpus-rare terms outrank corpus-common ones at equal tf") {
    val top1 = run("tfidf_top_terms").collect()
      .filter(r => r.getAs[Long]("doc_id") == 1L && r.getAs[Int]("rk") == 1)
      .map(_.getAs[String]("term"))
    // doc 1's terms all have tf=1; 'zeta' appears in no other doc while
    // alpha..epsilon all also appear in doc 0 -> zeta must rank first
    assert(top1.sameElements(Array("zeta")), s"expected rare term first, got ${top1.mkString}")
  }

  test("decontaminate_overlap: doc sharing >= 3 shingles with the pool is flagged, others not") {
    val rows = run("decontaminate_overlap").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_overlap")).toMap
    // doc 1 shares shingles (alpha,beta,gamma),(beta,gamma,delta),
    // (gamma,delta,epsilon) with pool doc 0 -> 3 overlaps, flagged
    assert(rows.get(1L).contains(3L), s"doc 1 should be flagged with 3 overlaps, got $rows")
    assert(!rows.contains(5L), "doc with no pool overlap must not be flagged")
    assert(!rows.contains(0L), "pool docs themselves are excluded from the output")
  }

  test("gopherRules at the published minStopHits = 2 discriminates 1-stopword docs") {
    import spark.implicits._
    // two docs that pass every OTHER rule identically (>= 50 words of
    // 3-10 mean chars, fully alphabetic): one carries a single distinct
    // stop word, one carries two — only the default (Gopher-published)
    // threshold separates them, so this pins the >= 2 production path
    // the fixture instantiation (minStopHits = 1) cannot reach
    val filler = (1 to 48).map(i => s"word${i % 9}").mkString(" ")
    val docs = Seq(
      (1L, s"the $filler the"),        // 1 distinct stop word ('the')
      (2L, s"the $filler and"))        // 2 distinct ('the', 'and')
      .toDF("doc_id", "text")
    val byId = TextOps.gopherRules(docs)   // all-default = published config
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("r_stops"), r.getAs[Int]("r_words"),
          r.getAs[Int]("r_mean_len"), r.getAs[Int]("r_alpha"),
          r.getAs[Int]("keep"))).toMap
    assert(byId(1L) == ((0, 1, 1, 1, 0)),
      s"1 stop word must fail ONLY r_stops under >= 2, got ${byId(1L)}")
    assert(byId(2L) == ((1, 1, 1, 1, 1)),
      s"2 distinct stop words must pass the full gate, got ${byId(2L)}")
    // and the fixture instantiation keeps doc 1 — the two configurations
    // differ exactly on r_stops
    val relaxed = TextOps.gopherRules(docs, minStopHits = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("keep")).toMap
    assert(relaxed(1L) == 1 && relaxed(2L) == 1)
  }

  test("ccnet_buckets: per-language tertile invariants on the real fixture") {
    val rows = SparkEntry.queries("ccnet_buckets")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Double]("fluency"),
        r.getAs[String]("bucket")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byBucket = rs.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      val n = rs.length
      // value thresholding: every head score >= every middle >= every tail
      for (h <- byBucket.get("head"); m <- byBucket.get("middle"))
        assert(h.min >= m.max, s"$lang: head/middle value order violated")
      for (m <- byBucket.get("middle"); t <- byBucket.get("tail"))
        assert(m.min >= t.max, s"$lang: middle/tail value order violated")
      // sizing: head covers at least its tertile (ties join the better
      // bucket, so it may only overshoot by the tie group at the cutoff)
      val head = byBucket.getOrElse("head", Array.empty[Double])
      val k1 = (n + 2) / 3
      assert(head.length >= k1, s"$lang: head ${head.length} < ceil(n/3)=$k1")
      if (head.nonEmpty) {
        val tiesAtCut = head.count(_ == head.min)
        assert(head.length - tiesAtCut < k1,
          s"$lang: head overshoots beyond the cutoff tie group")
      }
      val hm = head.length + byBucket.getOrElse("middle", Array.empty[Double]).length
      assert(hm >= (2 * n + 2) / 3, s"$lang: head+middle misses ceil(2n/3)")
    }
  }

  test("c4_rules: full construction + cleaning matches an independent in-JVM model") {
    import graft.functions.{HashExpressions, Portable}
    // the same construction + C4 rules, re-derived in plain Scala against
    // the native evalPolyHash — an oracle independent of BOTH engine SQL
    // dialects, so a construction bug mirrored into the DuckDB twin would
    // still fail here
    def model(text: String): (Long, Long, Int, Int, Int, String) = {
      def ph(s: String): Long = HashExpressions.evalPolyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val ts = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val raw = ts.grouped(8).map(_.mkString(" ")).toSeq
      val noisy = raw.map { l =>
        val h = ph(l)
        l + (if (h % 3 == 0) "" else if (h % 7 == 0) " javascript tip here today." else ".")
      }
      val pageh = ph(text)
      val lines =
        if (pageh % 13 == 0) noisy :+ "lorem ipsum dolor sit amet consectetur."
        else if (pageh % 17 == 0) noisy :+ "var config = { mode: strict }"
        else noisy
      val kept = lines.filter(l => ".!?".contains(l.last) &&
        l.split(" ").length >= 5 && !l.contains("javascript"))
      val hasLorem = if (lines.exists(_.contains("lorem ipsum"))) 1 else 0
      val hasBrace = if (lines.exists(_.contains("{"))) 1 else 0
      val keep = if (hasLorem == 0 && hasBrace == 0 && kept.size >= 3) 1 else 0
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(kept.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (lines.size.toLong, kept.size.toLong, hasLorem, hasBrace, keep, md)
    }
    // drive the registered query over the real sf0.001 fixture — every doc
    // must match the model exactly, including the reconstruction md5
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val got = SparkEntry.queries("c4_rules")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"), r.getAs[Int]("has_lorem"),
          r.getAs[Int]("has_brace"), r.getAs[Int]("keep"), r.getAs[String]("cleaned_md5")))
    assert(got.nonEmpty)
    got.foreach { case (id, row) =>
      assert(row == model(docs(id)), s"doc $id diverges from the in-JVM model")
    }
    // every rule must discriminate on the fixture, or the gate is decorative
    val keeps = got.map(_._2._5).toSet
    assert(keeps == Set(0, 1), "keep flag must split the fixture")
    assert(got.exists(_._2._3 == 1), "some page must carry the lorem injection")
    assert(got.exists(_._2._4 == 1), "some page must carry the brace injection")
    assert(got.exists(r => r._2._5 == 0 && r._2._3 == 0 && r._2._4 == 0),
      "some page must fail on the < 3 retained lines rule alone")
    // ... and the LINE-level rules too: count, via the model's own line
    // construction, how many fixture lines each rule drops — if a noise
    // modulus or threshold edit made one vanish, md5 parity would still
    // pass and keep would still split via the <3-lines path, so pin the
    // per-rule counts explicitly
    def ph(s: String): Long = HashExpressions.evalPolyHash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    var nPunct, nWords, nJs = 0
    docs.values.foreach { text =>
      val ts = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      ts.grouped(8).map(_.mkString(" ")).foreach { raw =>
        val h = ph(raw)
        val l = raw + (if (h % 3 == 0) "" else if (h % 7 == 0) " javascript tip here today." else ".")
        if (!".!?".contains(l.last)) nPunct += 1
        else if (l.contains("javascript")) nJs += 1
        else if (l.split(" ").length < 5) nWords += 1
      }
    }
    assert(nPunct > 0, "the terminal-punctuation rule must drop some fixture lines")
    assert(nWords > 0, "the >= 5-words rule must drop some fixture lines")
    assert(nJs > 0, "the javascript rule must drop some fixture lines")
    // keep=1 implies all gates passed
    got.filter(_._2._5 == 1).foreach { case (id, (_, nk, hl, hb, _, _)) =>
      assert(nk >= 3 && hl == 0 && hb == 0, s"doc $id: keep=1 with a failing gate")
    }
  }

  test("c4_rules: empty text takes the page-noise path, not a crash") {
    // pageh('') = 0 and 0 % 13 == 0: the lorem line is appended to an
    // otherwise empty page — flags fire, keep = 0, md5 is of the retained
    // lorem line (it passes every LINE rule; the PAGE rule drops the doc)
    val row = run("c4_rules").filter("doc_id = 2").collect().head
    assert(row.getAs[Long]("n_lines") == 1L)
    assert(row.getAs[Long]("n_kept") == 1L)
    assert(row.getAs[Int]("has_lorem") == 1)
    assert(row.getAs[Int]("keep") == 0)
  }

  test("c4_span_dedup: cross-doc span removal matches an independent in-JVM model") {
    // the full C4 span-dedup semantics re-derived in plain Scala — an
    // oracle independent of both engine SQL dialects: 8-token lines,
    // sliding 3-line spans, GLOBAL min-(doc_id, spos) canonical keeps its
    // lines, every other occurrence's three lines are removed, and the
    // per-doc reconstruction md5 must agree byte-for-byte
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val fixDir = "/root/testdata/sf0.001"
    val lines = spark.read.parquet(s"$fixDir/documents.parquet")
      .collect().map { r =>
        val t = Option(r.getAs[String]("text")).getOrElse("")
        r.getAs[Long]("doc_id") -> t.toLowerCase.split("[^a-z0-9]+")
          .filter(_.nonEmpty).grouped(8).map(_.mkString(" ")).toSeq
      }.toSeq.sortBy(_._1)
    val occ = scala.collection.mutable.Map.empty[String, List[(Long, Int)]]
    for ((id, ls) <- lines; i <- 1 to math.max(0, ls.size - 2))
      occ.updateWith(ls.slice(i - 1, i + 2).mkString(" ")) {
        prev => Some((id, i) :: prev.getOrElse(Nil))
      }
    val removed = scala.collection.mutable.Set.empty[(Long, Int)]
    occ.values.filter(_.size > 1).foreach { os =>
      os.sorted.tail.foreach { case (d, sp) =>
        (sp to sp + 2).foreach(li => removed += ((d, li)))
      }
    }
    val expect = lines.map { case (id, ls) =>
      val kept = ls.zipWithIndex.collect {
        case (l, i0) if !removed((id, i0 + 1)) => l
      }
      id -> (ls.size.toLong, kept.size.toLong,
        (ls.size - kept.size).toLong, md5(kept.mkString("\n")))
    }.toMap
    val got = SparkEntry.queries("c4_span_dedup")(spark, fixDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got == expect)
    // the fixture must actually exercise removal, or the model proves nothing
    assert(expect.values.exists(_._3 > 0),
      "sf0.001 must contain duplicated 3-line spans")
  }

  test("c4SpanDedup: span geometry is the signature — a 2-line window catches what 3 misses") {
    import spark.implicits._
    def line(p: String) = (1 to 8).map(i => s"$p$i").mkString(" ")
    // docs share their first TWO lines but not three: invisible to the
    // published 3-sentence window, caught at spanLines = 2 (the shorter
    // window trades precision for recall — the knob, exercised)
    val df = Seq(
      (1L, s"${line("a")} ${line("b")} ${line("c")}"),
      (2L, s"${line("a")} ${line("b")} ${line("d")}"))
      .toDF("doc_id", "text")
    val at3 = TextOps.c4SpanDedup(df, lineTokens = 8, spanLines = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(at3 == Map(1L -> 0L, 2L -> 0L), "no 3-line span repeats")
    val at2 = TextOps.c4SpanDedup(df, lineTokens = 8, spanLines = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // (a, b) duplicates; doc 1 is canonical (min id), doc 2 loses both lines
    assert(at2 == Map(1L -> 0L, 2L -> 2L), s"2-line window must fire, got $at2")
  }
}
