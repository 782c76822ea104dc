package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation for skewed group keys (SCALE.md §Skew).
  *
  * Phase 1 groups by (key, salt) — the hot key's rows spread over
  * `salts` reducers; phase 2 merges the partials per key. Only
  * merge-associative aggregates (sum/count/min/max) are eligible; the
  * caller supplies the partial aggregates and the matching merge exprs.
  */
object Salting {

  /** Salted sum/count aggregation: returns one row per key with
    * `sum_<col>` and `cnt` columns. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column, salts: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("partial_sum"), count(lit(1)).as("partial_cnt"))
      .groupBy(col("key"))
      .agg(sum(col("partial_sum")).as("sum_value"), sum(col("partial_cnt")).as("cnt"))
  }
}
