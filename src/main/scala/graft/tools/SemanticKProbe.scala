package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe for the semantic-dedup cell-count knob: runs
  * `Similarity.semanticDedup` against one or more embedding corpora with
  * k sized per the operator's √N default (or a fixed override), and
  * reports the in-cell pair volume alongside cold-cache medians — the
  * measurement behind SCALE.md's "k ~ √N bounds the per-cell quadratic"
  * row (per-decade exponents, not prose). Timing discipline is identical
  * to `graft.Bench` via the shared `graft.BenchAction`.
  *
  * Usage: SemanticKProbe <dir>[,<dir>...] [sqrt|<k>] [reps]
  */
object SemanticKProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.tools.SemanticKProbe <dir>[,<dir>...] [sqrt|<k>] [reps]")
      sys.exit(2)
    }
    val dirs = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val kSpec = args.lift(1).getOrElse("sqrt")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-semkprobe")
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { dir =>
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val n = emb.count()
      val k =
        if (kSpec == "sqrt") math.max(1, math.round(math.sqrt(n.toDouble)).toInt)
        else kSpec.toInt
      // in-cell pair volume under the operator's own assignment — the
      // quantity the k knob exists to bound (sum over cells of C(c, 2))
      val pairs = emb
        .join(graft.operators.Similarity.assignCells(emb, k).drop("sim"), "vec_id")
        .groupBy(col("cell")).agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) div 2")).as("p"))
        .head().getAs[Long]("p")
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        graft.BenchAction.run(graft.operators.Similarity.semanticDedup(emb, k))
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
