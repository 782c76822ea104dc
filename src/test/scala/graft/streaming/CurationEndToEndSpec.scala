package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** End-to-end LLM-data curation: documents arrive as a STREAM, the intake
  * pipeline dedups and quality-gates them, and its kept-side parquet then
  * feeds the BATCH registry directly — proving the streaming and batch
  * halves compose through a real storage handoff (the P1→P2/P3 chain of
  * EndToEndSpec, replayed for the curation surface). */
class CurationEndToEndSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("stream intake -> kept parquet -> batch registry queries") {
    implicit val sq = spark.sqlContext
    val out = tmpDir("e2ecur")
    val ms = MemoryStream[(Long, String, String, Timestamp)]
    val raw = ms.toDF().toDF("doc_id", "text", "lang", "ts")
    val q = StreamingCuration.run(spark, raw, out)
    val good = (1 to 6).map(i =>
      s"document number $i with enough distinct clean tokens to pass the intake gate")
    try {
      ms.addData(
        (1L, good(0), "en", t("2024-01-01 00:00:01")),
        (2L, good(1), "en", t("2024-01-01 00:00:02")),
        (3L, good(0), "en", t("2024-01-01 00:00:03")), // in-batch dup of 1
        (4L, "hi", "en", t("2024-01-01 00:00:04")))    // quality reject
      q.processAllAvailable()
      ms.addData(
        (5L, good(1), "en", t("2024-01-01 00:10:00")), // cross-batch dup of 2
        (6L, good(2), "en", t("2024-01-01 00:10:01")),
        (7L, good(3), "en", t("2024-01-01 00:10:02")))
      q.processAllAvailable()
    } finally q.stop()

    // handoff: the kept side becomes the batch registry's documents table
    val dir = tmpDir("e2ecur_tables")
    StreamingCuration.kept(spark, out)
      .selectExpr("doc_id", "text", "lang", "'stream' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // batch exact dedup confirms the intake already removed every dup
    val exact = graft.SparkEntry.queries("dedup_exact")(spark, dir)
      .selectExpr("sum(is_dup)").as[Long].head()
    assert(exact == 0L, "stream intake must leave no exact duplicates for batch dedup to find")

    // quality scoring and leakage-safe splitting run unchanged on the feed
    val quality = graft.SparkEntry.queries("text_quality")(spark, dir)
      .selectExpr("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(quality.keySet == Set(1L, 2L, 6L, 7L) && quality.values.forall(_ > 0.3),
      s"the four kept docs score as clean text, got $quality")

    val split = graft.SparkEntry.queries("split_leakage_safe")(spark, dir)
      .as[(Long, Long, String)].collect().toSeq
    assert(split.map(_._1).toSet == Set(1L, 2L, 6L, 7L))
    assert(split.forall { case (doc, canon, _) => canon == doc },
      "deduped intake leaves only singletons — every doc self-canonical")
  }
}
