package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** P6 — order wide table: watermarked stream-stream interval join plus
  * chained dimension enrichments.
  *
  * Reference: RT/app/dwm/OrderWideApp.java:48-263 —
  *  - both order streams parsed with `create_ts` derived from the
  *    "yyyy-MM-dd HH:mm:ss" `create_time` string (lines 77-98);
  *  - 3 s bounded out-of-orderness watermarks (lines 105-124);
  *  - event-time interval join on order id (lines 127-141). The reference
  *    uses ±5 ms bounds — almost certainly a bug-as-written (SURVEY.md
  *    §7.4.6); the bound is a parameter here;
  *  - 6 async Redis/Phoenix dim lookups (lines 149-251) become broadcast
  *    stream-static joins — vectorized, no per-row RPC, dims re-read per
  *    micro-batch when driven through foreachBatch.
  */
object OrderWide {

  /** Parse a raw order_info JSON stream: derive event-time `create_ts`. */
  def parseInfo(raw: DataFrame): DataFrame =
    raw.selectExpr(
        "get_json_object(value, '$.id') AS id",
        "get_json_object(value, '$.province_id') AS province_id",
        "get_json_object(value, '$.order_status') AS order_status",
        "get_json_object(value, '$.user_id') AS user_id",
        "get_json_object(value, '$.total_amount') AS total_amount",
        "get_json_object(value, '$.create_time') AS create_time")
      .select(
        col("id").cast("long"), col("province_id").cast("long"),
        col("order_status"), col("user_id").cast("long"),
        col("total_amount").cast("decimal(16,2)"),
        to_timestamp(col("create_time"), "yyyy-MM-dd HH:mm:ss").as("create_ts"))

  /** Parse a raw order_detail JSON stream. */
  def parseDetail(raw: DataFrame): DataFrame =
    raw.selectExpr(
        "get_json_object(value, '$.id') AS detail_id",
        "get_json_object(value, '$.order_id') AS order_id",
        "get_json_object(value, '$.sku_id') AS sku_id",
        "get_json_object(value, '$.sku_name') AS sku_name",
        "get_json_object(value, '$.order_price') AS order_price",
        "get_json_object(value, '$.sku_num') AS sku_num",
        "get_json_object(value, '$.create_time') AS create_time")
      .select(
        col("detail_id").cast("long"), col("order_id").cast("long"),
        col("sku_id").cast("long"), col("sku_name"),
        col("order_price").cast("decimal(16,2)"),
        col("sku_num").cast("long"),
        to_timestamp(col("create_time"), "yyyy-MM-dd HH:mm:ss").as("d_create_ts"))

  /** Event-time interval join: detail.ts within ±`boundSeconds` of info.ts,
    * equi on order id, 3 s watermarks on both sides (reference semantics;
    * bound configurable — the reference's ±5 ms, OrderWideApp.java:135). */
  def intervalJoin(info: DataFrame, detail: DataFrame, boundSeconds: Int = 5,
      watermark: String = "3 seconds"): DataFrame = {
    val i = info.withWatermark("create_ts", watermark)
    val d = detail.withWatermark("d_create_ts", watermark)
    i.join(d,
      col("order_id") === col("id") &&
        col("d_create_ts") >= col("create_ts") - expr(s"INTERVAL $boundSeconds SECONDS") &&
        col("d_create_ts") <= col("create_ts") + expr(s"INTERVAL $boundSeconds SECONDS"))
  }

  /** The six dimension enrichments as broadcast left joins + derived columns
    * (age from birthday as-of a fixed date for determinism; province/sku/
    * spu/category3/trademark renames — OrderWideApp.java:149-251). Dims are
    * the all-varchar shape of FIXTURES.md §B.6. */
  def enrich(wide: DataFrame, dims: Dims, asOfDate: String): DataFrame =
    wide
      .join(broadcast(dims.user), col("user_id") === dims.user("uid"), "left")
      .withColumn("user_age",
        floor(months_between(lit(asOfDate).cast("date"), col("birthday")) / 12).cast("int"))
      .drop("uid", "birthday")
      .join(broadcast(dims.province), col("province_id") === dims.province("pid"), "left")
      .drop("pid")
      .join(broadcast(dims.sku), col("sku_id") === dims.sku("skid"), "left")
      .drop("skid")
      .join(broadcast(dims.spu), col("spu_id") === dims.spu("spid"), "left")
      .drop("spid")
      .join(broadcast(dims.category3), col("category3_id") === dims.category3("c3id"), "left")
      .drop("c3id")
      .join(broadcast(dims.trademark), col("tm_id") === dims.trademark("tmid"), "left")
      .drop("tmid")

  /** Dimension table bundle (FIXTURES.md §B.6 columns). */
  case class Dims(
      user: DataFrame,      // uid, birthday, gender
      province: DataFrame,  // pid, province_name, iso_code, area_code
      sku: DataFrame,       // skid, dim_sku_name, spu_id, category3_id, tm_id
      spu: DataFrame,       // spid, spu_name
      category3: DataFrame, // c3id, category3_name
      trademark: DataFrame) // tmid, tm_name

  /** Build the dim bundle from parquet dirs (one per dim, reference's
    * DIM_* tables); used with per-micro-batch re-read for freshness. */
  def dimsFromParquet(spark: SparkSession, dir: String): Dims = Dims(
    user = spark.read.parquet(s"$dir/dim_user_info"),
    province = spark.read.parquet(s"$dir/dim_base_province"),
    sku = spark.read.parquet(s"$dir/dim_sku_info"),
    spu = spark.read.parquet(s"$dir/dim_spu_info"),
    category3 = spark.read.parquet(s"$dir/dim_base_category3"),
    trademark = spark.read.parquet(s"$dir/dim_base_trademark"))
}
