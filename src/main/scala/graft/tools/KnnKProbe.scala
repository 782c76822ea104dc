package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe for the kNN label-probe's cell knob: runs
  * `Similarity.knnLabelProbe` against one or more embedding corpora with
  * k sized per the operator's √N default (or a fixed override), reporting
  * in-cell pair volume + cold-cache medians — the same measurement
  * SemanticKProbe records for dedup_semantic, because the two operators
  * share the assignment and the N²/k bound. Timing discipline identical
  * to `graft.Bench` via the shared `graft.BenchAction`.
  *
  * Usage: KnnKProbe <dir>[,<dir>...] [sqrt|<k>] [reps]
  */
object KnnKProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.tools.KnnKProbe <dir>[,<dir>...] [sqrt|<k>] [reps]")
      sys.exit(2)
    }
    val dirs = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val kSpec = args.lift(1).getOrElse("sqrt")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-knnprobe")
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { dir =>
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val n = emb.count()
      val k =
        if (kSpec == "sqrt") math.max(1, math.round(math.sqrt(n.toDouble)).toInt)
        else kSpec.toInt
      val pairs = emb
        .join(graft.operators.Similarity.assignCells(emb, k).drop("sim"), "vec_id")
        .groupBy(col("cell")).agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) div 2")).as("p"))
        .head().getAs[Long]("p")
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        graft.BenchAction.run(graft.operators.Similarity.knnLabelProbe(emb, k))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      spark.catalog.clearCache()
      val med = graft.BenchAction.median(times.toList)
      println(f"$dir%s n=$n%d k=$k%d pairs=$pairs%d cold_median=$med%.2f " +
        s"runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
