package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** P3 — CDC changelog routing driven by a live config table.
  *
  * Reference: RT/app/dwd/BaseDbTask.java:31-94 +
  * RT/app/func/TableProcessFunction.java:41-183 —
  *  - Maxwell envelope {database, table, type, data} parsed, ETL-filtered
  *    (BaseDbTask.java:57-59);
  *  - `bootstrap-insert` normalized to `insert` (TableProcessFunction:69-73);
  *  - routing config (source_table, operate_type -> sink_type, sink_table,
  *    sink_columns, sink_pk) joined as a broadcast; unmatched rows dropped
  *    (the reference logs "no this key" and skips);
  *  - per-row dynamic column pruning to `sink_columns`
  *    (TableProcessFunction.filterColumns:100-114) as a `map_filter`;
  *  - fact rows -> per-topic sink (topic = sink_table column), dim rows ->
  *    keyed upsert store. The 5 s config-refresh Timer becomes a re-read of
  *    the config every micro-batch inside foreachBatch.
  */
object CdcRouter {

  /** Parse + ETL-filter the Maxwell envelope from a raw JSON `value` col. */
  def parse(raw: DataFrame): DataFrame =
    raw.select(
        get_json_object(col("value"), "$.database").as("database"),
        get_json_object(col("value"), "$.table").as("table"),
        get_json_object(col("value"), "$.type").as("type"),
        get_json_object(col("value"), "$.data").as("data"))
      .withColumn("type",
        when(col("type") === "bootstrap-insert", "insert").otherwise(col("type")))
      .filter(col("table").isNotNull && col("data").isNotNull && length(col("data")) > 3)

  /** Join with the routing config and prune `data` to `sink_columns`. */
  def route(cdc: DataFrame, config: DataFrame): DataFrame =
    cdc.join(broadcast(config),
        cdc("table") === config("source_table") && cdc("type") === config("operate_type"))
      .withColumn("data_map", from_json(col("data"), MapType(StringType, StringType)))
      .withColumn("cols", split(col("sink_columns"), ","))
      .withColumn("data_pruned",
        map_filter(col("data_map"), (k, _) => array_contains(col("cols"), k)))
      .select(col("database"), col("table"), col("type"),
        col("sink_type"), col("sink_table"), col("sink_pk"),
        to_json(col("data_pruned")).as("data"), col("data_pruned"),
        // pk from the UNPRUNED envelope: a config whose sink_columns list
        // omits the pk (DimDdl.ensureTable explicitly supports it by
        // prepending the column) leaves no pk key in data_pruned — under
        // ANSI mode element_at would kill the micro-batch, and with ANSI
        // off every dim row would collapse onto pk NULL. try_element_at
        // keeps a malformed envelope a null-pk row, not a query failure.
        expr("try_element_at(data_map, sink_pk)").as("pk"))

  /** One micro-batch of routing: facts appended per-topic (partitioned by
    * sink_table ≈ dynamic-topic Kafka sink), dims upserted by primary key
    * (last write wins ≈ Phoenix `upsert into`, DimSink.java:34-61). */
  def processBatch(batch: DataFrame, config: DataFrame, outDir: String, batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    val routed = route(batch, config).persist()
    try {
      // seq: a DETERMINISTIC within-batch discriminator. Two legitimately
      // identical fact records in one batch get seq 1 and 2 (they must both
      // survive the exactly-once dedup); a replayed batch regenerates the
      // SAME (data, seq) multiset, so replays still collapse. Ordering among
      // identical rows is immaterial — any assignment yields the same set.
      val factSeq = Window.partitionBy(col("sink_table"), col("data")).orderBy(lit(1))
      routed.filter(col("sink_type") === "kafka")
        .select(col("sink_table"), col("data"), lit(batchId).as("batch_id"))
        .withColumn("seq", row_number().over(factSeq))
        .write.mode("append").partitionBy("sink_table").parquet(s"$outDir/facts")

      // same device for dims: two upserts to one pk within a batch need a
      // deterministic winner (the reference has Kafka offset order; a file
      // batch does not) — rank by payload for a stable, replay-identical
      // intra-batch order, and let dimSnapshot take the highest
      val dimSeq = Window.partitionBy(col("sink_table"), col("pk"))
        .orderBy(col("data"))
      val dims = routed.filter(col("sink_type") === "hbase")
        .select(col("sink_table"), col("pk"),
          col("data"), lit(batchId).as("batch_id"),
          row_number().over(dimSeq).as("seq"))
      dims.write.mode("append").partitionBy("sink_table").parquet(s"$outDir/dims_log")
    } finally routed.unpersist()
  }

  /** Exactly-once view over the at-least-once facts log. Spark's Kafka (and
    * file) sinks are at-least-once: a micro-batch replayed after a failure
    * between sink write and checkpoint commit appends byte-identical
    * (sink_table, batch_id, data) rows. Keyed dedup on read restores
    * exactly-once — the idempotent-consumer recipe for the reference's
    * transactional-producer gap (MyKafkaUtil.java:43-49; see
    * sources/Kafka.scala scaladoc and CdcRouterSpec's replay test). At
    * scale this is a per-(batch_id) shuffle-free dedup when the log is
    * partitioned by batch_id; here the general dropDuplicates form. */
  def factsExactlyOnce(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/facts")
      .dropDuplicates("sink_table", "batch_id", "data", "seq")

  /** Read the current dim snapshot: last write per (sink_table, pk) from the
    * upsert log — the keyed-KV-store view the reference holds in HBase. */
  def dimSnapshot(spark: SparkSession, outDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sink_table"), col("pk"))
      .orderBy(col("batch_id").desc, col("seq").desc)
    spark.read.parquet(s"$outDir/dims_log")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "batch_id", "seq")
  }

  /** Launch the streaming router: config re-read from `configPath` (CSV with
    * a header, FIXTURES.md §B.4) every micro-batch. */
  def run(spark: SparkSession, raw: DataFrame, configPath: String, outDir: String) =
    raw.writeStream
      .option("checkpointLocation", s"$outDir/_chk")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val config = spark.read.option("header", "true").csv(configPath)
        processBatch(parse(batch), config, outDir, batchId)
      }
      .start()
}
