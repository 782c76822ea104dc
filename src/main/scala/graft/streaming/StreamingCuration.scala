package graft.streaming

import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming corpus intake: the batch curation operators (quality gate,
  * exact dedup) composed into a Structured Streaming pipeline — documents
  * arrive as a stream, are content-deduplicated across micro-batches with
  * bounded state, quality-gated, and split kept/rejected in one pass.
  *
  * This is the LLM-data analog of the reference's UV pipeline shape
  * (keyed dedup state with a TTL, `RT/app/dwm/UniqueVisitApp.java:57-95`):
  * `dropDuplicatesWithinWatermark` on the content digest holds one state
  * row per distinct document inside the watermark horizon and EVICTS it
  * once the watermark passes — at 100 TB/day of intake the dedup state is
  * bounded by the horizon's distinct-content volume, not by history.
  * The kept/rejected fan-out reuses the one-pass `foreachBatch` multi-sink
  * pattern of `LogPipeline` (persist once, write both sides).
  */
object StreamingCuration {

  /** Map-side quality columns (the streaming half of `curate_corpus`'s
    * gate): token count bounds + uniqueness-ratio floor. */
  private def scored(batch: DataFrame): DataFrame =
    batch
      .withColumn("toks", expr(Portable.tokensSql("text")))
      .withColumn("n_tokens", expr("CAST(size(toks) AS BIGINT)"))
      .withColumn("uniq_ratio", expr(
        "CASE WHEN size(toks) > 0 THEN CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks) ELSE CAST(0 AS DOUBLE) END"))
      .withColumn("keep", col("n_tokens").between(3, 5000) && col("uniq_ratio") >= 0.2)
      .drop("toks")

  /** Launch: `raw` is a streaming DataFrame with (doc_id, text, lang, ts).
    * Writes `outDir/kept` and `outDir/rejected` parquet. */
  def run(spark: SparkSession, raw: DataFrame, outDir: String,
      horizon: String = "1 hour"): StreamingQuery = {
    val deduped = raw
      .withColumn("digest", md5(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("digest")
    deduped.writeStream
      .option("checkpointLocation", s"$outDir/_chk")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = scored(batch).persist()
        try {
          s.filter(col("keep")).drop("keep")
            .write.mode("append").parquet(s"$outDir/kept")
          s.filter(!col("keep")).drop("keep")
            .write.mode("append").parquet(s"$outDir/rejected")
        } finally { s.unpersist(); () }
      }
      .start()
  }
}
