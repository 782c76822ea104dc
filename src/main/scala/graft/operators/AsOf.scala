package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Backward as-of join — for each left row, the payload of the LATEST right
  * row with the same key and time ≤ the left row's time. Spark has no such
  * operator (the brief's canonical "operator Spark lacks"); the scalable
  * composition is the union+running-last form:
  *
  *   tag rows (right=0, left=1) → union → one shuffle on the key →
  *   running `last(payload, ignoreNulls)` over (time, tag) order →
  *   keep left rows.
  *
  * One shuffle, O(1) window state per row, no per-key range-join blowup —
  * the plan a 100 TB point-in-time feature join needs (a naive
  * `l.t >= r.t` range join materializes O(|L|·|R|) per key before
  * ranking). Right rows sort BEFORE left rows at equal time (tag order),
  * so t_left == t_right matches, per as-of convention. The right side must
  * be unique per (key, time) for determinism — dedupe upstream.
  *
  * Oracle: DuckDB's native `ASOF LEFT JOIN` — an independent
  * implementation validating the semantics, not a replay of ours.
  */
object AsOf {

  /** @param payload right-side columns carried onto each left row
    *                (null when the key has no right row at-or-before). */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val r = right.select(
      col(key), col(rightTime).as("__t"),
      struct(payload.map(col): _*).as("__p"))
      .withColumn("__is_left", lit(0))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = unioned
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
    val carried = payload.map(p => col(s"__last.$p").as(p))
    joined.select(left.columns.toIndexedSeq.map(col) ++ carried: _*)
  }

  val defs: ListMap[String, QueryDef] = ListMap(

    // ---- point-in-time enrichment: each event picks up the latest order
    // of the same customer at-or-before the event time. Right side is
    // deduped to one row per (key, time) — max orderkey wins — so the
    // as-of choice is deterministic in both engines. ------------------------
    "q28_asof_join" -> QueryDef(
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
        val ordW = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
          .orderBy(col("o_orderkey").desc)
        val ord = Tables.load(s, dir, "orders")
          .withColumn("rn", row_number().over(ordW))
          .filter(col("rn") === 1)
          .select(col("o_custkey").as("user_id"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("o_t"),
            col("o_orderkey").as("last_orderkey"),
            col("o_totalprice").cast("double").as("last_total"))
        asofBackward(ev, ord, "user_id", "ts_us", "o_t",
          Seq("last_orderkey", "last_total"))
          .orderBy("event_id")
      },
      """WITH r AS (
        |  SELECT o_custkey AS user_id,
        |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_t,
        |    o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
        |      ORDER BY o_orderkey DESC) AS rn
        |  FROM orders),
        |rd AS (SELECT user_id, o_t, o_orderkey, o_totalprice FROM r WHERE rn = 1),
        |l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
        |SELECT l.event_id, l.user_id, l.ts_us,
        |  rd.o_orderkey AS last_orderkey,
        |  CAST(rd.o_totalprice AS DOUBLE) AS last_total
        |FROM l ASOF LEFT JOIN rd
        |  ON l.user_id = rd.user_id AND l.ts_us >= rd.o_t
        |ORDER BY event_id""".stripMargin)
  )
}
