package graft.operators

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: transitive closure across chained pairs") {
    // a~b, b~c => one {1,2,3} cluster even though (1,3) never pairs;
    // {10,11} separate; chain 20-21-22-23 exercises multi-hop propagation
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L)).toDF("doc_a", "doc_b")
    val out = Curation.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L),
      10L -> (10L, 2L), 11L -> (10L, 2L),
      20L -> (20L, 4L), 21L -> (20L, 4L), 22L -> (20L, 4L), 23L -> (20L, 4L)))
  }

  test("connected components: singleton-free (only paired docs appear)") {
    val pairs = Seq((5L, 6L)).toDF("doc_a", "doc_b")
    val out = Curation.connectedComponents(pairs).collect()
    assert(out.map(_.getLong(0)).toSet == Set(5L, 6L))
  }

  test("shard_shuffle: a permutation — every doc exactly once, per-shard positions contiguous") {
    val dir = "/root/testdata/sf0.001"
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = graft.SparkEntry.queries("shard_shuffle")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"),
        r.getAs[Long]("skey"), r.getAs[Long]("pos")))
    // exactly-once assignment (it's a reshuffle, not a sample)
    assert(rows.map(_._1).toSet == all && rows.length == all.size)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(shard >= 0 && shard < 8)
      // positions are 1..|shard| with no gaps, ordered by (skey, doc_id)
      val byPos = rs.sortBy(_._4)
      assert(byPos.map(_._4).toSeq == (1L to rs.length).toSeq,
        s"shard $shard: positions not contiguous")
      val keys = byPos.map(r => (r._3, r._1)).toSeq
      assert(keys == keys.sorted, s"shard $shard: order must follow (skey, doc_id)")
    }
    // the hash actually spreads: all 8 shards populated, and the within-
    // shard order is NOT ingest order (the whole point of the shuffle)
    assert(rows.map(_._2).distinct.length == 8, "all shards must be populated")
    val firstShard = rows.filter(_._2 == rows.minBy(_._2)._2).sortBy(_._4).map(_._1)
    assert(firstShard.toSeq != firstShard.sorted.toSeq,
      "within-shard order should be hash order, not doc_id order")
  }

  test("pack_efficiency: sweep invariants against the corpus totals") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val totalChars = docs.agg(org.apache.spark.sql.functions.sum("n_chars"))
      .head.getLong(0)
    val nParts = docs.selectExpr("lang", "doc_id div 1000 AS shard")
      .distinct().count()
    val rows = graft.SparkEntry.queries("pack_efficiency")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == Seq(1024L, 2048L, 4096L, 8192L))
    rows.foreach { case (l, np, nSeqs, total, pad, util) =>
      assert(np == nParts && total == totalChars)
      // pad and utilization are definitional in (n_seqs, L, total)
      assert(pad == nSeqs * l - total && util == total * 1000 / (nSeqs * l))
      // per-partition ceil can never beat the global lower bound
      assert(nSeqs >= (total + l - 1) / l, s"L=$l: n_seqs below ceil(total/L)")
    }
    // doubling L can only reduce the sequence count (ceil is monotone)
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sorted.reverse,
      "n_seqs must be non-increasing in L")
  }

  test("mix_epoch_plan: the 4-epoch cap binds for scarce sources and not for rich ones") {
    val d = tmpDir("epochplan")
    // two sources, budget 1M -> target 500k each: `src0` holds 400k tokens
    // (epochs_m = 1250, under the cap), `src1` holds 50k (epochs_m =
    // 10000, capped at 4000 -> planned 200k, a visible deficit)
    val rows2 = ((0 until 400).map(i => (i.toLong, "src0")) ++
      (0 until 50).map(i => (1000L + i, "src1")))
      .map { case (id, src) => org.apache.spark.sql.Row(
        id, Seq.fill(1000)("tok").mkString(" "), "en", src, 0L) }
    val schema2 = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows2, 4), schema2)
      .write.parquet(s"$d/documents.parquet")
    val out = graft.SparkEntry.queries("mix_epoch_plan")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      // (source, n_tokens, target, epochs_m, capped_m, planned)
      ("src0", 400000L, 500000L, 1250L, 1250L, 500000L),
      ("src1", 50000L, 500000L, 10000L, 4000L, 200000L)))
    // the knobs are the SIGNATURE: a 2M budget doubles every target and a
    // 2-epoch cap halves where it binds (src1: 2000 milli-epochs -> 100k)
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val out2 = Curation.mixEpochPlan(docs, budgetTokens = 2000000L,
        capMilliEpochs = 2000L).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out2.toSeq == Seq(
      ("src0", 1000000L, 2500L, 2000L, 800000L),
      ("src1", 1000000L, 20000L, 2000L, 100000L)))
  }

  test("mix_unimax: capped sources free budget that waterfills to the ones with headroom") {
    val d = tmpDir("unimax")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
    // srcA 100 tokens, srcB 1000, srcC 5000 -> capacities at 4 epochs:
    // 400 / 4000 / 20000
    val rows = (Seq((0L, "srcA", 100)) ++ Seq((1L, "srcB", 1000)) ++
      (0 until 5).map(i => (10L + i, "srcC", 1000)))
      .map { case (id, src, n) => org.apache.spark.sql.Row(
        id, Seq.fill(n)("tok").mkString(" "), "en", src, 0L) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.parquet(s"$d/documents.parquet")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def run(b: Long): Seq[(String, Long, Long, Long, Int)] =
      Curation.mixUnimax(docs, budgetTokens = b, capMilliEpochs = 4000L)
        .collect()
        .map(r => (r.getString(0), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getInt(6))).toSeq

    // B = 10000: A and B hit the cap (400*3 = 1200 <= 10k; 4000*2 + 400 =
    // 8400 <= 10k), C takes the ENTIRE freed remainder 10000 - 4400 =
    // 5600 — far above the naive uniform share 3333 mix_epoch_plan stops
    // at. Budget is exactly exhausted.
    assert(run(10000L) == Seq(
      ("srcA", 400L, 400L, 4000L, 1),
      ("srcB", 4000L, 4000L, 4000L, 1),
      ("srcC", 20000L, 5600L, 1120L, 0)))
    // B = 5000: only A capped; B and C share the remainder at one common
    // level (5000 - 400) div 2 = 2300 — maximal uniformity under the cap
    assert(run(5000L) == Seq(
      ("srcA", 400L, 400L, 4000L, 1),
      ("srcB", 4000L, 2300L, 2300L, 0),
      ("srcC", 20000L, 2300L, 460L, 0)))
    // B = 100000 >= total capacity 24400: the data-constrained regime —
    // every source capped at capacity, the leftover deliberately unspent
    assert(run(100000L) == Seq(
      ("srcA", 400L, 400L, 4000L, 1),
      ("srcB", 4000L, 4000L, 4000L, 1),
      ("srcC", 20000L, 20000L, 4000L, 1)))
    intercept[IllegalArgumentException] {
      Curation.mixUnimax(docs, budgetTokens = 0L)
    }
  }

  test("quality_funnel: stage chaining, and each gate discriminates on a constructed corpus") {
    val d = tmpDir("funnel")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
    // 25 tokens, contains stop words, uniq ratio fine -> survives everything
    val good = "the cat and the dog walk to of town with that other dog " +
      "every day to have a look at the fish pond nearby"
    // 25 tokens, no stop words at all -> dies ONLY at the stopword gate
    val noStop = (1 to 25).map(i => s"w$i").mkString(" ")
    // 30 tokens but only 2 distinct -> uniq ratio 2/30 < 0.2 -> repetition gate
    val repet = Array.fill(15)("spam ham").mkString(" ")
    val rows = Seq(
      (0L, good), (1L, good) /* exact dup of 0 */, (2L, good) /* another */,
      (3L, noStop), (4L, repet), (5L, "too short"), (6L, null.asInstanceOf[String]))
      .map { case (id, t) =>
        org.apache.spark.sql.Row(id, t, "en", "s",
          if (t == null) 0L else t.length.toLong)
      }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.parquet(s"$d/documents.parquet")
    val out = graft.SparkEntry.queries("quality_funnel")(spark, d).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // funnel: 7 in; dedup drops the 2 extra copies of `good`; length drops
    // the short doc AND the null doc; repetition drops `repet`; stop words
    // drop `noStop` -> 1 survivor
    assert(out.toSeq == Seq(
      (1, "ingest", 7L, 7L, 0L, 0L),
      (2, "exact_dedup", 7L, 5L, 2L, 285L),
      (3, "length_gate", 5L, 3L, 2L, 400L),
      (4, "repetition_gate", 3L, 2L, 1L, 333L),
      (5, "stopword_gate", 2L, 1L, 1L, 500L)))
    // chaining is structural, not coincidental: each stage's docs_in is the
    // previous stage's docs_kept
    out.sliding(2).foreach { case Array(prev, next) =>
      assert(next._3 == prev._4, s"stage ${next._2} docs_in != previous docs_kept")
    }
  }
}
