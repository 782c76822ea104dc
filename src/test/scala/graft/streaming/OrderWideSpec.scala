package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class OrderWideSpec extends SparkSpec {
  import spark.implicits._

  private def info(id: Long, user: Long, t: String): String =
    s"""{"id":$id,"province_id":3,"order_status":"1001","user_id":$user,
       |"total_amount":199.00,"create_time":"$t"}""".stripMargin.replaceAll("\n", "")
  private def detail(id: Long, order: Long, sku: Long, t: String): String =
    s"""{"id":$id,"order_id":$order,"sku_id":$sku,"sku_name":"thing",
       |"order_price":99.00,"sku_num":1,"create_time":"$t"}""".stripMargin.replaceAll("\n", "")

  test("stream-stream interval join: only details within ±5 s of the order") {
    implicit val sq = spark.sqlContext
    val msI = MemoryStream[String]
    val msD = MemoryStream[String]
    val joined = OrderWide.intervalJoin(
      OrderWide.parseInfo(msI.toDF()), OrderWide.parseDetail(msD.toDF()), boundSeconds = 5)
    val q = joined.writeStream.format("memory").queryName("ow").outputMode("append").start()
    try {
      msI.addData(info(1, 11, "2021-11-13 11:10:00"), info(2, 12, "2021-11-13 11:10:20"))
      // d1 inside bound; d2 outside (+30 s); d3 inside, arrives out of order
      msD.addData(detail(101, 1, 5, "2021-11-13 11:10:02"),
        detail(102, 1, 5, "2021-11-13 11:10:30"))
      q.processAllAvailable()
      msD.addData(detail(103, 2, 6, "2021-11-13 11:10:21"))
      q.processAllAvailable()
      val out = spark.table("ow").select("id", "detail_id").as[(Long, Long)].collect().toSet
      assert(out == Set((1L, 101L), (2L, 103L)))
    } finally q.stop()
  }

  test("six-dimension broadcast enrichment with derived age") {
    val wide = Seq((1L, 11L, 3L, 5L, 7L, 9L, 13L))
      .toDF("id", "user_id", "province_id", "sku_id", "spu_id", "category3_id", "tm_id")
    val dims = OrderWide.Dims(
      user = Seq((11L, "1990-06-15", "M")).toDF("uid", "birthday", "gender")
        .withColumn("birthday", col("birthday").cast("date")),
      province = Seq((3L, "Shandong", "CN-37", "370000")).toDF("pid", "province_name", "iso_code", "area_code"),
      sku = Seq((5L, "iPhone", 7L, 9L, 13L)).toDF("skid", "dim_sku_name", "d_spu_id", "d_c3_id", "d_tm_id"),
      spu = Seq((7L, "iPhone family")).toDF("spid", "spu_name"),
      category3 = Seq((9L, "Phones")).toDF("c3id", "category3_name"),
      trademark = Seq((13L, "Apple")).toDF("tmid", "tm_name"))
    val out = OrderWide.enrich(wide, dims, asOfDate = "2024-01-01").collect().head
    val m = out.getValuesMap[Any](Seq("user_age", "gender", "province_name",
      "dim_sku_name", "spu_name", "category3_name", "tm_name"))
    assert(m("user_age") == 33)
    assert(m("gender") == "M")
    assert(m("province_name") == "Shandong")
    assert(m("spu_name") == "iPhone family")
    assert(m("category3_name") == "Phones")
    assert(m("tm_name") == "Apple")
  }

  test("missing dim rows pass through as nulls (left join, skip-on-null parity)") {
    val wide = Seq((1L, 99L, 98L, 97L, 96L, 95L, 94L))
      .toDF("id", "user_id", "province_id", "sku_id", "spu_id", "category3_id", "tm_id")
    val empty = spark.emptyDataFrame
    val dims = OrderWide.Dims(
      user = Seq.empty[(Long, String, String)].toDF("uid", "birthday", "gender")
        .withColumn("birthday", col("birthday").cast("date")),
      province = Seq.empty[(Long, String)].toDF("pid", "province_name"),
      sku = Seq.empty[(Long, String)].toDF("skid", "dim_sku_name"),
      spu = Seq.empty[(Long, String)].toDF("spid", "spu_name"),
      category3 = Seq.empty[(Long, String)].toDF("c3id", "category3_name"),
      trademark = Seq.empty[(Long, String)].toDF("tmid", "tm_name"))
    val out = OrderWide.enrich(wide, dims, asOfDate = "2024-01-01").collect().head
    assert(out.getAs[Any]("gender") == null)
    assert(out.getAs[Any]("tm_name") == null)
    assert(out.getAs[Long]("id") == 1L)
  }
}
