package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config-driven DDL + upsert for dimension tables — the engine's analog of
  * the reference's on-the-fly Phoenix DDL and upsert SQL generation
  * (RT/app/func/TableProcessFunction.java:141-183, RT/app/func/DimSink
  * .java:64-73): every column string-typed, one string primary key
  * (default "id"), created if absent.
  *
  * Scale design: dim tables are partitioned by `pk_bucket =
  * pmod(xxhash64(pk), N)` and upserts use DYNAMIC partition overwrite —
  * each micro-batch reads and rewrites ONLY the buckets its keys hash
  * into, so per-batch I/O is O(touched buckets), not O(table). A small
  * trickle batch touches a few buckets; a full reload touches all of them
  * and degrades gracefully to the rewrite-everything cost. For the
  * log-structured alternative (append + last-write-wins view, better for
  * high-churn dims) see CdcRouter.processBatch/dimSnapshot.
  */
object DimDdl {

  val SchemaName = "gmall_realtime" // GmallConfig.java:11 namespace parity

  /** Hash-bucket count for dim partitioning. 16 keeps files per table
    * bounded for reference-sized dims; at 100 TB scale set per-table from
    * expected row count (buckets ≈ table_bytes / target_file_size). */
  val NumBuckets = 16

  def ensureSchema(spark: SparkSession): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $SchemaName")

  /** CREATE TABLE IF NOT EXISTS <schema>.<sinkTable>(cols string..., pk
    * string) PARTITIONED BY (pk_bucket) from the config row's CSV column
    * list (sink_pk default id). */
  def ensureTable(spark: SparkSession, sinkTable: String, sinkColumns: String,
      sinkPk: String): Unit = {
    ensureSchema(spark)
    val pk = Option(sinkPk).filter(_.nonEmpty).getOrElse("id")
    val cols = sinkColumns.split(",").map(_.trim).filter(_.nonEmpty)
    val colDefs = (if (cols.contains(pk)) cols else pk +: cols)
      .map(c => s"`$c` STRING").mkString(", ")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $SchemaName.`$sinkTable`
         | ($colDefs, `pk_bucket` INT)
         | USING parquet PARTITIONED BY (`pk_bucket`)""".stripMargin)
  }

  /** The partition a key's row lives in. */
  def bucketOf(pk: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(pk), lit(NumBuckets)).cast("int")

  /** Upsert a batch of rows (map column `data_pruned`) into the dim table:
    * keyed merge, last write wins — `upsert into` parity without a
    * transactional store. Incremental: only the pk-buckets present in the
    * batch are read (partition pruning) and rewritten (dynamic partition
    * overwrite); untouched bucket files are left as-is. */
  def upsert(spark: SparkSession, sinkTable: String, sinkPk: String,
      batch: DataFrame): Unit = {
    val pk = Option(sinkPk).filter(_.nonEmpty).getOrElse("id")
    val target = s"$SchemaName.`$sinkTable`"
    val dataCols = spark.table(target).columns.filter(_ != "pk_bucket")
    // try_element_at: the table's column set accretes via config (and the
    // pk may be prepended by ensureTable), so a batch row's map can lack
    // any of them — under ANSI mode plain element_at would kill the batch;
    // the intended value for an absent key is null
    val incoming0 = batch
      .select(dataCols.toIndexedSeq.map(c =>
        expr(s"try_element_at(data_pruned, '$c')").as(c)): _*)
      .filter(col(pk).isNotNull) // a dim row without its pk is undeliverable
    // deterministic last-write-wins: dropDuplicates keeps an ARBITRARY
    // within-batch row (and a replay can keep a different one, leaving the
    // store divergent across retries). Rank by the full payload — the same
    // replay-stable intra-batch order CdcRouter.processBatch uses.
    val payloadOrder = dataCols.toIndexedSeq.filter(_ != pk) match {
      case Seq() => Seq(org.apache.spark.sql.functions.lit(1).asc)
      case cs => cs.map(c => col(c).desc_nulls_last)
    }
    val winner = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pk)).orderBy(payloadOrder: _*)
    val incoming = incoming0
      .withColumn("__rn", row_number().over(winner)).filter(col("__rn") === 1)
      .drop("__rn")
      .withColumn("pk_bucket", bucketOf(col(pk)))
    // bucket ids, not data: bounded by NumBuckets, safe to collect
    val touched = incoming.select("pk_bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    val existing = spark.table(target) // pruned scan: only touched partitions
      .filter(col("pk_bucket").isin(touched: _*))
    val merged = existing
      .join(incoming.select(col(pk).as("__pk")), col(pk) === col("__pk"), "left_anti")
      .drop("__pk")
      .unionByName(incoming)
      .select((dataCols.toIndexedSeq :+ "pk_bucket").map(col): _*) // insertInto is positional
    // stage to a scratch dir (Spark cannot overwrite partitions it is
    // reading) — O(touched buckets) I/O, not O(table). The scratch lives
    // on the SHARED FileSystem next to the warehouse (a driver-local
    // java.nio temp dir breaks on a multi-node cluster: executors would
    // write file:// paths on their own machines — review find; same
    // discipline as Compaction's dot-prefixed scratch)
    val hconf = spark.sparkContext.hadoopConfiguration
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val scratchPath = new org.apache.hadoop.fs.Path(
      warehouse, s".dim_upsert_${sinkTable}_${System.nanoTime()}")
    val fs = scratchPath.getFileSystem(hconf)
    val scratch = scratchPath.toString
    merged.write.mode("overwrite").parquet(scratch)
    // session conf, not writer option: insertInto ignores the per-write
    // partitionOverwriteMode option on catalog tables
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try spark.read.parquet(scratch).write.mode("overwrite").insertInto(target)
    finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      // a long-running CDC stream calls upsert every micro-batch: the
      // scratch copy must not accumulate on the shared filesystem
      fs.delete(scratchPath, true)
    }
  }
}
