package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config-driven DDL + upsert for dimension tables — the engine's analog of
  * the reference's on-the-fly Phoenix DDL and upsert SQL generation
  * (RT/app/func/TableProcessFunction.java:141-183, RT/app/func/DimSink
  * .java:64-73): every column string-typed, one string primary key
  * (default "id"), created if absent.
  */
object DimDdl {

  val SchemaName = "gmall_realtime" // GmallConfig.java:11 namespace parity

  def ensureSchema(spark: SparkSession): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $SchemaName")

  /** CREATE TABLE IF NOT EXISTS <schema>.<sinkTable>(cols string..., pk
    * string) from the config row's CSV column list (sink_pk default id). */
  def ensureTable(spark: SparkSession, sinkTable: String, sinkColumns: String,
      sinkPk: String): Unit = {
    ensureSchema(spark)
    val pk = Option(sinkPk).filter(_.nonEmpty).getOrElse("id")
    val cols = sinkColumns.split(",").map(_.trim).filter(_.nonEmpty)
    val colDefs = (if (cols.contains(pk)) cols else pk +: cols)
      .map(c => s"`$c` STRING").mkString(", ")
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $SchemaName.`$sinkTable` ($colDefs) USING parquet")
  }

  /** Upsert a batch of rows (map column `data_pruned`) into the dim table:
    * read-merge-overwrite keyed by pk, last write wins — `upsert into`
    * parity without a transactional store. For the log-structured
    * streaming variant see CdcRouter.processBatch/dimSnapshot. */
  def upsert(spark: SparkSession, sinkTable: String, sinkPk: String,
      batch: DataFrame): Unit = {
    val pk = Option(sinkPk).filter(_.nonEmpty).getOrElse("id")
    val target = s"$SchemaName.`$sinkTable`"
    val cols = spark.table(target).columns
    val incoming = batch
      .select(cols.map(c => element_at(col("data_pruned"), c).as(c)): _*)
      .dropDuplicates(pk)
    val merged = spark.table(target)
      .join(incoming.select(col(pk).as("__pk")), col(pk) === col("__pk"), "left_anti")
      .unionByName(incoming)
    // stage to a scratch dir: Spark cannot overwrite a table it is reading
    val scratch = java.nio.file.Files.createTempDirectory("dim_upsert").toString
    merged.write.mode("overwrite").parquet(scratch)
    spark.read.parquet(scratch).write.mode("overwrite").insertInto(target)
  }
}
