package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase aggregation equals direct aggregation") {
    // one hot key (90% of rows) + a long tail
    val df = spark.range(0, 10000)
      .selectExpr("IF(id % 10 < 9, 'hot', concat('k', id % 50)) AS k", "id AS v")
    val direct = df.groupBy($"k").agg(sum($"v").as("sum_value"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Salting.saltedSumCount(df, $"k", $"v", salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
