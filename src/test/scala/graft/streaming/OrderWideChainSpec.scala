package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** P6 full chain as one streaming query: stream-stream interval join
  * followed by stream-static broadcast dim enrichment (SURVEY.md §3.3). */
class OrderWideChainSpec extends SparkSpec {
  import spark.implicits._

  test("run(): launchable P6 pipeline writes the 34-field wide table to parquet") {
    implicit val sq = spark.sqlContext
    val dimDir = tmpDir("owdims")
    val outDir = tmpDir("owout")
    // dims as parquet (the per-micro-batch re-read path)
    Seq((11L, java.sql.Date.valueOf("1990-06-15"), "M")).toDF("uid", "birthday", "gender")
      .write.parquet(s"$dimDir/dim_user_info")
    Seq((3L, "Shandong", "CN-37", "370000", "CN-SD"))
      .toDF("pid", "province_name", "iso_code", "area_code", "iso_3166_2")
      .write.parquet(s"$dimDir/dim_base_province")
    Seq((5L, "iPhone", 7L, 9L, 13L))
      .toDF("skid", "dim_sku_name", "spu_id", "category3_id", "tm_id")
      .write.parquet(s"$dimDir/dim_sku_info")
    Seq((7L, "iPhone family")).toDF("spid", "spu_name").write.parquet(s"$dimDir/dim_spu_info")
    Seq((9L, "Phones")).toDF("c3id", "category3_name").write.parquet(s"$dimDir/dim_base_category3")
    Seq((13L, "Apple")).toDF("tmid", "tm_name").write.parquet(s"$dimDir/dim_base_trademark")

    val msI = MemoryStream[String]
    val msD = MemoryStream[String]
    val q = OrderWide.run(spark, msI.toDF(), msD.toDF(), dimDir, outDir, asOfDate = "2024-01-01")
    try {
      msI.addData(
        """{"id":1,"province_id":3,"order_status":"1001","user_id":11,"total_amount":199.00,"create_time":"2021-11-13 11:10:00"}""")
      msD.addData(
        """{"id":101,"order_id":1,"sku_id":5,"sku_name":"x","order_price":99.00,"sku_num":1,"create_time":"2021-11-13 11:10:02"}""")
      q.processAllAvailable()
      val out = spark.read.parquet(s"$outDir/dwm_order_wide")
      assert(out.columns.length == 35)
      val r = out.collect().head
      assert(r.getAs[Long]("order_id") == 1L)
      assert(r.getAs[String]("sku_name") == "iPhone") // dim override
      assert(r.getAs[String]("province_3166_2_code") == "CN-SD")
      assert(r.getAs[String]("tm_name") == "Apple")
    } finally q.stop()
  }

  test("interval join + dim enrichment compose in a single streaming query") {
    implicit val sq = spark.sqlContext
    val msI = MemoryStream[String]
    val msD = MemoryStream[String]
    val joined = OrderWide.intervalJoin(
      OrderWide.parseInfo(msI.toDF()), OrderWide.parseDetail(msD.toDF()), boundSeconds = 5)
    val dims = OrderWide.Dims(
      user = Seq((11L, "1990-06-15", "M")).toDF("uid", "birthday", "gender")
        .withColumn("birthday", col("birthday").cast("date")),
      province = Seq((3L, "Shandong", "CN-37", "370000", "CN-SD"))
        .toDF("pid", "province_name", "iso_code", "area_code", "iso_3166_2"),
      sku = Seq((5L, "iPhone", 7L, 9L, 13L)).toDF("skid", "dim_sku_name", "spu_id", "category3_id", "tm_id"),
      spu = Seq((7L, "iPhone family")).toDF("spid", "spu_name"),
      category3 = Seq((9L, "Phones")).toDF("c3id", "category3_name"),
      trademark = Seq((13L, "Apple")).toDF("tmid", "tm_name"))
    val wide = OrderWide.enrich(joined, dims, asOfDate = "2024-01-01")
    val q = wide.writeStream.format("memory").queryName("owchain")
      .outputMode("append").start()
    try {
      msI.addData(
        """{"id":1,"province_id":3,"order_status":"1001","user_id":11,"total_amount":199.00,"create_time":"2021-11-13 11:10:00"}""")
      msD.addData(
        """{"id":101,"order_id":1,"sku_id":5,"sku_name":"x","order_price":99.00,"sku_num":1,"create_time":"2021-11-13 11:10:02"}""")
      q.processAllAvailable()
      val out = spark.table("owchain").collect()
      assert(out.length == 1)
      val r = out.head
      assert(r.getAs[String]("user_gender") == "M")
      assert(r.getAs[Int]("user_age") == 33)
      assert(r.getAs[String]("province_name") == "Shandong")
      assert(r.getAs[String]("tm_name") == "Apple")
    } finally q.stop()
  }
}
