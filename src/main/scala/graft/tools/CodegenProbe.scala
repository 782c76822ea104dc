package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: confirm graft_* expressions stay inside WholeStageCodegen
  * (no CodegenFallback) and evaluate correctly under generated code. */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.HashExpressions.register(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "graft_minhash_sig(text) AS sig",
        "graft_simhash(text) AS sh", "graft_gram5(text) AS g",
        "graft_shingles(text) AS shg")
    df.explain("formatted")
    println("rows: " + df.count())
    println(df.selectExpr("max(sig[0])", "max(sh)", "max(size(g))", "max(size(shg))")
      .head().toString)
    spark.stop()
  }
}
