package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe for the radius-search band-width knob: runs
  * `Similarity.rangeSearch` against one or more embedding corpora at a
  * given (threshold, width), reporting candidate volume (the quantity
  * width exists to bound: occupancy is N / 2^width per band bucket)
  * alongside cold-cache medians — the measurement behind SCALE.md's
  * "width grows ~log2(N)" row. Timing discipline identical to
  * `graft.Bench` via the shared `graft.BenchAction`.
  *
  * Usage: RangeWidthProbe <dir>[,<dir>...] <width> <threshold> [reps] [sym]
  * The optional `sym` flag probes the SYMMETRIC variant
  * (Similarity.embeddingCosinePairs — dedup_embedding_cosine's body)
  * instead of the asymmetric query→corpus range search.
  */
object RangeWidthProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: graft.tools.RangeWidthProbe <dir>[,<dir>...] <width> <threshold> [reps] [sym]")
      sys.exit(2)
    }
    val dirs = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val width = args(1).toInt
    val threshold = args(2).toDouble
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val sym = args.lift(4).contains("sym")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-rangeprobe")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.HashExpressions.register(spark)
    dirs.foreach { dir =>
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val n = emb.count()
      // candidate volume under this width — Σ over (band, key) buckets of
      // (queries in bucket) × (members - 1), before the distinct
      val bands = emb
        .selectExpr("vec_id", s"graft_srp(embedding, ${width * 4}) AS sg")
        .selectExpr("vec_id",
          s"""explode(transform(sequence(0, 3), b -> struct(b AS band,
             | concat_ws('', slice(sg, b * $width + 1, $width)) AS key))) AS bk""".stripMargin)
        .selectExpr("vec_id", "bk.band AS band", "bk.key AS key")
      val cands =
        if (sym) bands.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("m"))
          .agg(sum(expr("m * (m - 1) div 2")).as("c"))
          .head().getAs[Long]("c")
        else bands.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("m"),
            sum(expr("IF(vec_id % 25 = 0, 1L, 0L)")).as("q"))
          .agg(sum(expr("q * (m - 1)")).as("c"))
          .head().getAs[Long]("c")
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        graft.BenchAction.run(
          if (sym) graft.operators.Similarity.embeddingCosinePairs(emb, threshold, width)
          else graft.operators.Similarity.rangeSearch(emb, 25, threshold, width))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      spark.catalog.clearCache()
      val med = graft.BenchAction.median(times.toList)
      println(f"$dir%s n=$n%d width=$width%d thr=$threshold%.2f cands=$cands%d " +
        f"cold_median=$med%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
