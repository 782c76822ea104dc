package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when SQL-expressible)
  * an equivalent DuckDB oracle query over the same parquet tables.
  *
  * Oracle-parity design rules (so value hashes match bit-for-bit):
  *  - money/measure sums: quantize per-row to DECIMAL (exact, order-independent
  *    sum), cast the final aggregate to DOUBLE;
  *  - averages: exact decimal sum cast to double, divided by count in double;
  *  - no transcendentals (ln/exp/pow) in outputs — libm results differ across
  *    engines; sqrt is IEEE-exact and allowed;
  *  - timestamps exported as epoch micros (bigint) or formatted strings, never
  *    raw nanosecond-origin timestamps;
  *  - every result deterministically ordered with a unique tie-break key.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDef {
  def apply(fn: (SparkSession, String) => DataFrame, oracle: String): QueryDef =
    QueryDef(fn, Some(oracle))
}
