package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Ordering semantics of the funnel — the part the dense fixture corpus
  * can't discriminate (every synthetic user converts): a purchase BEFORE
  * the first view must not count, a click before the view must not
  * resolve the click stage, and a user with no view is outside the
  * funnel entirely. Also pins the retention cohort assignment. */
class FunnelSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  private lazy val dir: String = {
    val d = tmpDir("funnel")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val rows = Seq(
      // u1: clean view -> click -> purchase (full funnel)
      Row(1L, t("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      Row(2L, t("2024-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
      Row(3L, t("2024-01-01 10:10:00"), 1L, "purchase", 9.0, "{}"),
      // u2: purchase BEFORE the view — view stage only
      Row(4L, t("2024-01-02 09:00:00"), 2L, "purchase", 5.0, "{}"),
      Row(5L, t("2024-01-02 10:00:00"), 2L, "view", 1.0, "{}"),
      // u3: click BEFORE the view — click must not count
      Row(6L, t("2024-01-03 08:00:00"), 3L, "click", 1.0, "{}"),
      Row(7L, t("2024-01-03 09:00:00"), 3L, "view", 1.0, "{}"),
      // u4: no view at all — outside the funnel
      Row(8L, t("2024-01-04 12:00:00"), 4L, "click", 1.0, "{}"),
      Row(9L, t("2024-01-04 12:05:00"), 4L, "purchase", 3.0, "{}"),
      // u1 returns in week 2 (day 8): retention (cohort 01-01, offset 1)
      Row(10L, t("2024-01-09 10:00:00"), 1L, "view", 1.0, "{}"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("funnel counts only in-order stages") {
    val r = SparkEntry.queries("funnel_conversion")(spark, dir).head()
    assert(r.getAs[Long]("n_view") == 3L, "u1, u2, u3 viewed; u4 never did")
    assert(r.getAs[Long]("n_click_after_view") == 1L,
      "only u1's click came after their view")
    assert(r.getAs[Long]("n_purchase_after_click") == 1L,
      "u2's pre-view purchase and u4's viewless purchase must not count")
    assert(r.getAs[Double]("click_rate") == 1.0 / 3.0)
  }

  test("retention assigns returns to the first-seen cohort's week offset") {
    val rows = SparkEntry.queries("user_retention")(spark, dir).collect()
      .map(x => (x.getAs[String]("cohort_date"), x.getAs[Long]("week_offset")) ->
        x.getAs[Long]("n_users")).toMap
    assert(rows(("2024-01-01", 0L)) == 1L, "u1 active in week 0 of their cohort")
    assert(rows(("2024-01-01", 1L)) == 1L, "u1's day-8 return lands in week offset 1")
    assert(rows(("2024-01-02", 0L)) == 1L && rows(("2024-01-03", 0L)) == 1L)
    assert(!rows.contains(("2024-01-09", 0L)), "a return never opens a new cohort")
  }
}
