package graft.streaming

import graft.functions.CountMin
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming heavy-hitter terms over a document stream: the Count-Min
  * sketch (`cms_heavy_hitters`' batch kernel) maintained ACROSS
  * micro-batches — the canonical streaming-sketch shape.
  *
  * Per micro-batch, executors fold their slice into partial sketches and
  * ONE ~32 KB merged sketch row reaches the driver, which adds it
  * (elementwise — addition commutes, so the cross-batch merge is exactly
  * [[CountMin.merge]]) into the running sketch. Total state is the
  * constant sketch size regardless of stream volume — the same
  * bounded-state argument as `StreamingCuration`'s watermark dedup and
  * the UV pipeline's TTL state, but O(1) instead of
  * O(distinct-in-horizon).
  *
  * Querying is batch-side: broadcast the frozen sketch back over a term
  * dictionary and estimate with the same `element_at` expression
  * `cms_heavy_hitters` uses — so a spec can (and does) assert the
  * streaming-built sketch is BIT-IDENTICAL to a batch build over the
  * concatenated input, and estimates never undercount true counts.
  */
object StreamingHeavyHitters {

  /** Driver-held running sketch, merged once per micro-batch. */
  final class Tracker extends Serializable {
    val agg = new CountMin()
    @volatile var sketch: Array[Long] = agg.zero

    /** Fold one micro-batch of documents (column `text`) into the sketch. */
    def update(batch: DataFrame): Unit = {
      val s = batch.sparkSession
      graft.functions.HashExpressions.register(s)
      import s.implicits._
      val partial = batch
        .selectExpr("explode(filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')) AS term")
        .selectExpr("graft_polyhash(term) AS h").as[Long]
        .select(agg.toColumn).head()
      // merge into a COPY, then publish: CountMin.merge mutates its first
      // argument in place, so merging the live array would let a
      // concurrent heavyHitters()/totalTokens reader observe a torn
      // sketch (some counters updated, others not) despite the volatile
      // reference — copy-on-write gives readers snapshot isolation
      sketch = agg.merge(sketch.clone(), partial)
    }

    def totalTokens: Long = sketch(CountMin.Depth * CountMin.Width)

    /** Heavy hitters among `dict` terms (column `term`): sketch-estimated
      * count >= total/denominator, deterministic (est DESC, term) order. */
    def heavyHitters(dict: DataFrame, denominator: Long = 200L): DataFrame = {
      val s = dict.sparkSession
      graft.functions.HashExpressions.register(s)
      import s.implicits._
      val frozen = Seq(sketch).toDF("cms")
      dict.selectExpr("term", "graft_polyhash(term) AS h")
        .crossJoin(broadcast(frozen))
        .withColumn("est_c", expr(CountMin.estimateSql("cms", "h")))
        .filter(expr(s"est_c * $denominator >= ${totalTokens}L"))
        .select(col("term"), col("est_c"))
        .orderBy(col("est_c").desc, col("term"))
    }
  }

  /** Wire a document stream into a tracker via foreachBatch. */
  def start(stream: Dataset[_], tracker: Tracker, checkpointDir: String): StreamingQuery =
    stream.toDF().writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        tracker.update(batch.toDF())
      }
      .start()
}
