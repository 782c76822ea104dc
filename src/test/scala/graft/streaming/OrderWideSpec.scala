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

  private def refDims = OrderWide.Dims(
    user = Seq((11L, "1990-06-15", "M")).toDF("uid", "birthday", "gender")
      .withColumn("birthday", col("birthday").cast("date")),
    province = Seq((3L, "Shandong", "CN-37", "370000", "CN-SD"))
      .toDF("pid", "province_name", "iso_code", "area_code", "iso_3166_2"),
    sku = Seq((5L, "iPhone", 7L, 9L, 13L))
      .toDF("skid", "dim_sku_name", "spu_id", "category3_id", "tm_id"),
    spu = Seq((7L, "iPhone family")).toDF("spid", "spu_name"),
    category3 = Seq((9L, "Phones")).toDF("c3id", "category3_name"),
    trademark = Seq((13L, "Apple")).toDF("tmid", "tm_name"))

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

  test("left-outer interval join: unmatched orders surface with null details after watermark") {
    implicit val sq = spark.sqlContext
    val msI = MemoryStream[String]
    val msD = MemoryStream[String]
    val joined = OrderWide.intervalJoin(
      OrderWide.parseInfo(msI.toDF()), OrderWide.parseDetail(msD.toDF()),
      boundSeconds = 5, joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("owlo").outputMode("append").start()
    try {
      // order 1 gets a detail; order 2 never does
      msI.addData(info(1, 11, "2021-11-13 11:10:00"), info(2, 12, "2021-11-13 11:10:01"))
      msD.addData(detail(101, 1, 5, "2021-11-13 11:10:02"))
      q.processAllAvailable()
      // advance BOTH watermarks far past order 2's bound so the outer
      // result can be emitted and its state evicted
      msI.addData(info(99, 13, "2021-11-13 12:00:00"))
      msD.addData(detail(999, 99, 5, "2021-11-13 12:00:00"))
      q.processAllAvailable()
      msI.addData(info(98, 13, "2021-11-13 13:00:00"))
      msD.addData(detail(998, 98, 5, "2021-11-13 13:00:00"))
      q.processAllAvailable()
      val rows = spark.table("owlo").select("id", "detail_id")
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(rows(1L) == Some(101L))
      assert(rows.contains(2L) && rows(2L).isEmpty,
        "unmatched order should emit with null detail columns")
    } finally q.stop()
  }

  test("six-dimension broadcast enrichment with derived age and dim-sourced spu/category3/tm ids") {
    // reference flow: the fact carries only user/province/sku ids; spu_id,
    // category3_id and tm_id come from DIM_SKU_INFO (OrderWideApp.java:196-203)
    val wide = Seq((1L, 11L, 3L, 5L)).toDF("id", "user_id", "province_id", "sku_id")
    val out = OrderWide.enrich(wide, refDims, asOfDate = "2024-01-01").collect().head
    val m = out.getValuesMap[Any](Seq("user_age", "user_gender", "province_name",
      "province_3166_2_code", "sku_name", "spu_id", "category3_id", "tm_id",
      "spu_name", "category3_name", "tm_name"))
    assert(m("user_age") == 33)
    assert(m("user_gender") == "M")
    assert(m("province_name") == "Shandong")
    assert(m("province_3166_2_code") == "CN-SD")
    assert(m("sku_name") == "iPhone")
    assert(m("spu_id") == 7L)
    assert(m("category3_id") == 9L)
    assert(m("tm_id") == 13L)
    assert(m("spu_name") == "iPhone family")
    assert(m("category3_name") == "Phones")
    assert(m("tm_name") == "Apple")
  }

  test("point-lookup enrichment (mapPartitions + LRU) matches the broadcast path exactly") {
    // KV view of the same fixture dims: key -> non-key values in schema
    // order (what an external HBase/Phoenix/JDBC store would return)
    def kv(df: org.apache.spark.sql.DataFrame, key: String): Map[Any, Seq[Any]] = {
      val ki = df.columns.indexOf(key)
      df.collect().map(r => r.get(ki) -> r.toSeq.patch(ki, Nil, 1)).toMap
    }
    val dims = refDims
    val stores = Map(
      "dim_user_info" -> kv(dims.user, "uid"),
      "dim_base_province" -> kv(dims.province, "pid"),
      "dim_sku_info" -> kv(dims.sku, "skid"),
      "dim_spu_info" -> kv(dims.spu, "spid"),
      "dim_base_category3" -> kv(dims.category3, "c3id"),
      "dim_base_trademark" -> kv(dims.trademark, "tmid"))
    val calls = spark.sparkContext.longAccumulator("dim-lookups")
    val client = new OrderWide.DimClient {
      def get(table: String, key: Any): Option[Seq[Any]] = {
        calls.add(1); stores(table).get(key)
      }
    }

    // hit rows + an all-miss row (nulls must match the left-join nulls)
    val wide = Seq((1L, 11L, 3L, 5L), (2L, 11L, 3L, 5L), (3L, 99L, 98L, 97L))
      .toDF("id", "user_id", "province_id", "sku_id")
    val viaBroadcast = OrderWide.enrich(wide, dims, asOfDate = "2024-01-01")
    val viaLookup = OrderWide.enrichPointLookup(wide, dims, client, asOfDate = "2024-01-01")
    assert(viaLookup.schema.map(f => (f.name, f.dataType)) ==
      viaBroadcast.schema.map(f => (f.name, f.dataType)))
    assert(viaLookup.orderBy("id").collect().toSeq ==
      viaBroadcast.orderBy("id").collect().toSeq,
      "the two dim-join strategies must produce identical rows")

    // LRU effectiveness: 100 same-key facts in one partition -> exactly one
    // store call per dim table (the other 99 per dim hit the cache)
    calls.reset()
    val skewed = spark.range(0, 100)
      .selectExpr("id", "11L AS user_id", "3L AS province_id", "5L AS sku_id")
      .coalesce(1)
    val n = OrderWide.enrichPointLookup(skewed.toDF(), dims, client,
      asOfDate = "2024-01-01").count()
    assert(n == 100)
    assert(calls.value == 6L,
      s"expected 1 store call per dim table via the LRU, got ${calls.value}")
  }

  test("missing dim rows pass through as nulls (left join, skip-on-null parity)") {
    val wide = Seq((1L, 99L, 98L, 97L, 96L, 95L, 94L))
      .toDF("id", "user_id", "province_id", "sku_id", "spu_id", "category3_id", "tm_id")
    val dims = OrderWide.Dims(
      user = Seq.empty[(Long, String, String)].toDF("uid", "birthday", "gender")
        .withColumn("birthday", col("birthday").cast("date")),
      province = Seq.empty[(Long, String)].toDF("pid", "province_name"),
      sku = Seq.empty[(Long, String)].toDF("skid", "dim_sku_name"),
      spu = Seq.empty[(Long, String)].toDF("spid", "spu_name"),
      category3 = Seq.empty[(Long, String)].toDF("c3id", "category3_name"),
      trademark = Seq.empty[(Long, String)].toDF("tmid", "tm_name"))
    val out = OrderWide.enrich(wide, dims, asOfDate = "2024-01-01").collect().head
    assert(out.getAs[Any]("user_gender") == null)
    assert(out.getAs[Any]("tm_name") == null)
    assert(out.getAs[Long]("id") == 1L)
  }

  test("mergePartial: per-field firstNonNull with left precedence (mergeOtherOrderWide parity)") {
    val a = Seq((1L, 101L, Some("1001"), None: Option[String]))
      .toDF("order_id", "detail_id", "order_status", "sku_name")
    val b = Seq(
      (1L, 101L, Some("2002"), Some("thing")), // overlapping row: left status wins, fills sku
      (2L, 202L, Some("1003"), Some("other"))) // right-only row passes through
      .toDF("order_id", "detail_id", "order_status", "sku_name")
    val out = OrderWide.mergePartial(a, b).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[String]("order_status"), r.getAs[String]("sku_name"))).toMap
    assert(out == Map(
      (1L, 101L) -> (("1001", "thing")),
      (2L, 202L) -> (("1003", "other"))))
  }

  test("parse is defensive: malformed JSON and missing fields yield typed nulls, not failures") {
    val raw = Seq(
      "not json at all",
      """{"id":"abc"}""",            // wrong type for id
      """{"id":7}""",                // minimal valid: everything else absent
      """{"id":8,"create_time":"not-a-time"}""").toDF("value")
    val parsed = OrderWide.parseInfo(raw).collect()
    assert(parsed.length == 4) // no row is dropped or throws
    val byId = parsed.map(r => Option(r.getAs[java.lang.Long]("id"))).toSeq
    assert(byId.count(_.isEmpty) == 2) // garbage + wrong-type rows
    val r7 = parsed.find(r => r.getAs[java.lang.Long]("id") == 7L).get
    assert(r7.getAs[Any]("total_amount") == null)
    assert(r7.getAs[Any]("create_ts") == null)
    val r8 = parsed.find(r => r.getAs[java.lang.Long]("id") == 8L).get
    assert(r8.getAs[Any]("create_ts") == null) // unparseable time -> null, no throw
    assert(r8.getAs[String]("create_date") == "not-a-time".substring(0, 10))
  }

  test("full 34-field OrderWide surface: golden row through parse -> join -> enrich -> project") {
    implicit val sq = spark.sqlContext
    val fullInfo =
      """{"id":1,"province_id":3,"order_status":"1001","user_id":11,
        |"total_amount":199.00,"activity_reduce_amount":10.00,
        |"coupon_reduce_amount":5.00,"original_total_amount":214.00,
        |"feight_fee":8.00,"expire_time":"2021-11-13 11:25:00",
        |"create_time":"2021-11-13 11:10:00",
        |"operate_time":"2021-11-13 11:11:00"}""".stripMargin.replaceAll("\n", "")
    val fullDetail =
      """{"id":101,"order_id":1,"sku_id":5,"sku_name":"thing",
        |"order_price":99.00,"sku_num":2,"create_time":"2021-11-13 11:10:02",
        |"split_total_amount":198.00,"split_activity_amount":9.00,
        |"split_coupon_amount":4.00}""".stripMargin.replaceAll("\n", "")
    val msI = MemoryStream[String]
    val msD = MemoryStream[String]
    val joined = OrderWide.intervalJoin(
      OrderWide.parseInfo(msI.toDF()), OrderWide.parseDetail(msD.toDF()), boundSeconds = 5)
    val wide = OrderWide.toOrderWide(
      OrderWide.enrich(joined, refDims, asOfDate = "2024-01-01"))
    assert(wide.columns.length == 35) // 34 populated + declared-only split_feight_fee
    val q = wide.writeStream.format("memory").queryName("owfull").outputMode("append").start()
    try {
      msI.addData(fullInfo)
      msD.addData(fullDetail)
      q.processAllAvailable()
      val rows = spark.table("owfull").collect()
      assert(rows.length == 1)
      val r = rows.head
      val expect = Map(
        "detail_id" -> 101L, "order_id" -> 1L, "sku_id" -> 5L,
        "order_price" -> new java.math.BigDecimal("99.00"),
        "sku_num" -> 2L, "sku_name" -> "iPhone", // dim overrides detail value
        "province_id" -> 3L, "order_status" -> "1001", "user_id" -> 11L,
        "total_amount" -> new java.math.BigDecimal("199.00"),
        "activity_reduce_amount" -> new java.math.BigDecimal("10.00"),
        "coupon_reduce_amount" -> new java.math.BigDecimal("5.00"),
        "original_total_amount" -> new java.math.BigDecimal("214.00"),
        "feight_fee" -> new java.math.BigDecimal("8.00"),
        "split_feight_fee" -> null,
        "split_activity_amount" -> new java.math.BigDecimal("9.00"),
        "split_coupon_amount" -> new java.math.BigDecimal("4.00"),
        "split_total_amount" -> new java.math.BigDecimal("198.00"),
        "expire_time" -> "2021-11-13 11:25:00",
        "create_time" -> "2021-11-13 11:10:00",
        "operate_time" -> "2021-11-13 11:11:00",
        "create_date" -> "2021-11-13", "create_hour" -> "11",
        "province_name" -> "Shandong", "province_area_code" -> "370000",
        "province_iso_code" -> "CN-37", "province_3166_2_code" -> "CN-SD",
        "user_age" -> 33, "user_gender" -> "M",
        "spu_id" -> 7L, "tm_id" -> 13L, "category3_id" -> 9L,
        "spu_name" -> "iPhone family", "tm_name" -> "Apple",
        "category3_name" -> "Phones")
      expect.foreach { case (k, v) =>
        assert(r.getAs[Any](k) == v, s"field $k: got ${r.getAs[Any](k)}, want $v")
      }
    } finally q.stop()
  }
}
