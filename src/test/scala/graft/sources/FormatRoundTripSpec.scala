package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch source/sink format parity (COVERAGE.md §2.1 "Parquet/CSV/JSON
  * batch scans"): the same table written and re-read through each built-in
  * columnar/text format round-trips value-identically to the parquet
  * source of truth. CSV is schema-less on disk, so the read applies the
  * source schema explicitly — the production shape for ingesting
  * headered CSV drops.
  */
class FormatRoundTripSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def digest(df: DataFrame): Long = {
    val row = df.selectExpr("bit_xor(xxhash64(struct(*))) AS h").head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  test("customer round-trips through ORC, JSON, and CSV bit-identically") {
    val src = Tables.load(spark, sfDir, "customer")
    // normalize: JSON/CSV have no native decimal/timestamp fidelity rules
    // we want to test here — customer is strings + ints + doubles already
    val base = src.orderBy("c_custkey")
    val want = digest(base)
    val d = tmpDir("fmt")

    base.write.orc(s"$d/c_orc")
    assert(digest(spark.read.orc(s"$d/c_orc").orderBy("c_custkey")) == want,
      "ORC round-trip must be value-identical")

    base.write.json(s"$d/c_json")
    assert(digest(spark.read.schema(src.schema).json(s"$d/c_json")
      .orderBy("c_custkey")) == want,
      "JSON round-trip with explicit schema must be value-identical")

    base.write.option("header", "true").csv(s"$d/c_csv")
    assert(digest(spark.read.option("header", "true").schema(src.schema)
      .csv(s"$d/c_csv").orderBy("c_custkey")) == want,
      "CSV round-trip with explicit schema must be value-identical")
  }

  test("ORC predicate pushdown and column pruning survive the format switch") {
    val d = tmpDir("fmtorc")
    Tables.load(spark, sfDir, "customer").write.orc(s"$d/c_orc")
    val q = spark.read.orc(s"$d/c_orc")
      .filter(col("c_acctbal") > 0).select("c_custkey", "c_acctbal")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal"),
      s"ORC scan must receive the pushed filter:\n$plan")
    assert(plan.contains("ReadSchema: struct<c_custkey:bigint,c_acctbal:double>")
      || plan.contains("ReadSchema: struct<c_custkey:int,c_acctbal:double>"),
      s"ORC scan must prune to the 2 referenced columns:\n$plan")
  }
}
