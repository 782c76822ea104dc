package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("equi-join on co-bucketed tables plans with zero shuffle exchanges") {
    val li = (1L to 200L).map(k => (k % 50, s"item$k")).toDF("l_orderkey", "item")
    val ord = (1L to 50L).map(k => (k, s"cust${k % 7}")).toDF("o_orderkey", "cust")
    def dropClean(name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val loc = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
      if (java.nio.file.Files.exists(loc))
        org.apache.commons.io.FileUtils.deleteDirectory(loc.toFile)
    }
    dropClean("b_li")
    dropClean("b_ord")
    Bucketing.writeBucketed(li, "b_li", "l_orderkey", 4)
    Bucketing.writeBucketed(ord, "b_ord", "o_orderkey", 4)
    // force SMJ (broadcast would hide the co-location property under test)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_li")
        .join(spark.table("b_ord"), col("l_orderkey") === col("o_orderkey"))
      assert(j.count() == 196) // keys 1..49 with 4 rows each
      val shuffles = j.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected zero exchanges on co-bucketed join, found ${shuffles.size}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE b_li")
      spark.sql("DROP TABLE b_ord")
    }
  }
}
