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
}
