package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("bounded buffer keeps k best with (score DESC, id ASC) tie-break") {
    val agg = new TopK(3)
    val vals = Seq((0.5, 10L), (0.9, 2L), (0.9, 1L), (0.1, 7L), (0.7, 4L))
    val reduced = vals.foldLeft(agg.zero)(agg.reduce)
    assert(reduced == Vector((0.9, 1L), (0.9, 2L), (0.7, 4L)))
    // merge must agree regardless of how the input was split (partial aggs)
    val (l, r) = vals.splitAt(2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged == reduced)
  }

  test("udaf form: one aggregation yields per-group top-k") {
    val topk = udaf(new TopK(2), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    val df = Seq(("a", 0.3, 1L), ("a", 0.8, 2L), ("a", 0.5, 3L), ("b", 0.4, 9L))
      .toDF("g", "score", "id")
    val out = df.groupBy($"g").agg(topk($"score", $"id").as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "t")))
      .select($"g", $"t._2".as("id"), ($"pos" + 1).as("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set(("a", 2L, 1), ("a", 3L, 2), ("b", 9L, 1)))
  }
}
