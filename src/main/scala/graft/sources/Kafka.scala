package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Kafka source/sink wiring — the engine's analog of the reference's
  * MyKafkaUtil (RT/utils/MyKafkaUtil.java:25-49).
  *
  * No broker exists in the test container, so these are exercised by the
  * driver-less unit path only (the transform logic they wrap — parse,
  * route, serialize — is covered by MemoryStream suites; swap source ≈
  * `format("kafka")` for `MemoryStream` is the Structured Streaming
  * unified-model guarantee).
  *
  * Semantics notes vs the reference:
  *  - consumer group -> checkpoint location identity (offsets tracked in
  *    the checkpoint, not broker-side group state);
  *  - the exactly-once transactional producer (MyKafkaUtil.java:43-49,
  *    15 min txn timeout) has no Spark equivalent — the Kafka sink is
  *    at-least-once; end-to-end exactly-once requires idempotent consumers
  *    or a transactional store (documented semantic gap, SURVEY.md §7.4.3).
  *    The working recipe is demonstrated: a replayed micro-batch appends
  *    byte-identical (topic, batch_id, value) records, so consumer-side
  *    keyed dedup restores exactly-once — see
  *    [[graft.streaming.CdcRouter.factsExactlyOnce]] and the
  *    "at-least-once replay" test in CdcRouterSpec.
  */
object Kafka {

  /** String-value stream from a topic (MyKafkaUtil.getKafkaSource parity). */
  def source(spark: SparkSession, servers: String, topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .selectExpr("CAST(value AS STRING) AS value", "timestamp AS kafka_ts")

  /** Fixed-topic string sink (MyKafkaUtil.getKafkaSink parity). */
  def sink(df: DataFrame, servers: String, topic: String,
      checkpoint: String): DataStreamWriter[Row] =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** Dynamic-topic sink: topic taken per-record from `topicCol` — the
    * analog of the reference's ObjectMapper schema sink where topic =
    * sink_table (BaseDbTask.java:74-85). Spark's Kafka sink honors a
    * `topic` column when no topic option is set. */
  def dynamicSink(df: DataFrame, servers: String, topicCol: String,
      valueCol: String, checkpoint: String): DataStreamWriter[Row] =
    df.select(col(topicCol).as("topic"), col(valueCol).cast("string").as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("checkpointLocation", checkpoint)
}
