package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** curriculum_plan: stage assignment off the score DISTRIBUTION and the
  * per-(stage, shard) deterministic ordering, pinned on hand-computed
  * fixtures (including the tie-endpoint rule). Cross-engine exactness
  * is the DuckDB oracle's job at sf0.01.
  */
class CurriculumSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("score", LongType)))

  private def scored(rows: (Long, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2),
      schema)

  test("quartile stages on a uniform distribution, 2 docs per stage") {
    val d = scored((1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L),
      (5L, 40L), (6L, 50L), (7L, 60L), (8L, 70L))
    val got = Curation.curriculumPlan(d, stages = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // stage = 1 + (cum-1)*4 div 8 over the cumulative distribution:
    // score 10 (cum 2) -> 1, 20 (3) -> 2, 30 (4) -> 2, 40 (5) -> 3,
    // 50 (6) -> 3, 60 (7) -> 4, 70 (8) -> 4
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 3L, 6L -> 3L, 7L -> 4L, 8L -> 4L))
  }

  test("a tie-group straddling a boundary lands entirely at its cumulative endpoint") {
    val d = scored((1L, 5L), (2L, 5L), (3L, 5L), (4L, 9L))
    val got = Curation.curriculumPlan(d, stages = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // score 5: cum 3 -> stage 1 + 2*2 div 4 = 2 for ALL THREE ties —
    // the endpoint rule may leave an earlier stage empty, deterministically
    assert(got.values.toSet == Set(2L))
  }

  test("pos is contiguous 1..n inside every (stage, shard); order is (skey, doc_id)") {
    val d = scored((1L to 100L).map(i => i -> (i % 13) * 7L): _*)
    val rows = Curation.curriculumPlan(d, stages = 4, nShards = 4).collect()
    assert(rows.length == 100)
    rows.groupBy(r => (r.getLong(1), r.getInt(2))).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.getLong(3), r.getLong(0)))
      assert(sorted.map(_.getLong(4)).toSeq == (1L to rs.length).toSeq,
        "rank must be dense and follow (skey, doc_id)")
    }
  }

  test("single stage degenerates to shard_shuffle's per-shard ordering") {
    val d = scored((1L to 20L).map(i => i -> i): _*)
    val got = Curation.curriculumPlan(d, stages = 1, nShards = 2).collect()
    assert(got.forall(_.getLong(1) == 1L))
    assert(got.map(_.getLong(0)).toSet == (1L to 20L).toSet)
  }
}
