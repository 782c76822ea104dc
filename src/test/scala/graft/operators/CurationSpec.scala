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
}
