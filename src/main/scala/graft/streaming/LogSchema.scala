package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Log-event envelope (FIXTURES.md §B.1; field shape dictated by every path
  * the reference accesses — see SURVEY.md §1.2).
  *
  * Reference: RT/app/dwd/BaseLogTask.java:52-135, RT/app/dwm/UniqueVisitApp
  * .java:51-95, RT/app/dwm/UserJumpDetailApp.java:73-128.
  */
object LogSchema {

  val displaySchema: StructType = StructType(Seq(
    StructField("item", StringType),
    StructField("pos_id", LongType)))

  val schema: StructType = StructType(Seq(
    StructField("common", StructType(Seq(
      StructField("mid", StringType),
      StructField("is_new", StringType)))),
    StructField("page", StructType(Seq(
      StructField("page_id", StringType),
      StructField("last_page_id", StringType)))),
    StructField("start", StructType(Seq(
      StructField("entry", StringType)))),
    StructField("displays", ArrayType(displaySchema)),
    StructField("ts", LongType)))

  /** Parse a raw JSON string column `value` into the envelope plus an
    * event-time timestamp column `ets` (epoch millis -> TimestampType).
    * Works identically on batch and streaming frames. */
  def parse(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value"), schema).as("j"))
      .select(col("j.*"))
      .withColumn("ets", timestamp_millis(col("ts")))

  /** Typed row for the stateful operators. */
  case class LogEvent(
      mid: String,
      isNew: String,
      pageId: String,
      lastPageId: String,
      hasStart: Boolean,
      ts: Long)

  /** Project the parsed envelope to the typed shape (null-safe). A
    * malformed JSON line parses to an all-null struct; LogEvent.ts is a
    * primitive Long, so a null ts would kill the typed decode of every
    * stateful pipeline built on this — drop such rows instead (the
    * reference's dirty-data side-output drops them too). */
  def toEvents(parsed: DataFrame): DataFrame =
    parsed.filter(col("ts").isNotNull && col("common.mid").isNotNull)
      .select(
        col("common.mid").as("mid"),
        coalesce(col("common.is_new"), lit("")).as("isNew"),
        coalesce(col("page.page_id"), lit("")).as("pageId"),
        coalesce(col("page.last_page_id"), lit("")).as("lastPageId"),
        col("start").isNotNull.as("hasStart"),
        col("ts"))
}
