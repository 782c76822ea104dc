package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DimDdlSpec extends SparkSpec {
  import spark.implicits._

  test("config-driven CREATE TABLE IF NOT EXISTS + keyed upsert (last write wins)") {
    DimDdl.ensureTable(spark, "dim_user_info_t", "id,name,birthday", "id")
    DimDdl.ensureTable(spark, "dim_user_info_t", "id,name,birthday", "id") // idempotent
    val t = s"${DimDdl.SchemaName}.`dim_user_info_t`"
    assert(spark.table(t).columns.toSeq == Seq("id", "name", "birthday"))

    def batch(rows: (String, String, String)*) =
      rows.toSeq.toDF("id", "name", "birthday")
        .select(map(lit("id"), col("id"), lit("name"), col("name"),
          lit("birthday"), col("birthday")).as("data_pruned"))

    DimDdl.upsert(spark, "dim_user_info_t", "id",
      batch(("u1", "alice", "1990-01-01"), ("u2", "bob", "1991-01-01")))
    DimDdl.upsert(spark, "dim_user_info_t", "id", batch(("u1", "alice2", "1990-01-01")))

    val byId = spark.table(t).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId == Map("u1" -> "alice2", "u2" -> "bob"))
    spark.sql(s"DROP TABLE $t")
  }
}
