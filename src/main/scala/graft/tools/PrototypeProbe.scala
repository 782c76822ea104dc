package graft.tools

/** Scratch probe for prototype_prune's decade behavior: times the full
  * kmeans + per-cell hardness-rank prune across embedding-corpus decades
  * at BOTH the fixture cell count (k = 4) and k ~ √N. Measured outcome
  * (SCALE.md round-10 continuation): the INVERSE of the semantic-dedup
  * knob — the prune has no pair volume, so fixed k is near-flat across
  * decades while k ~ √N pushes the N·k assignment cosines to N^1.5.
  * k is a granularity/per-task-volume knob here, not a safety knob.
  * Timing discipline is identical to `graft.Bench` via
  * `graft.BenchAction`.
  *
  * Usage: PrototypeProbe <dir>[,<dir>...] [reps]
  */
object PrototypeProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.tools.PrototypeProbe <dir>[,<dir>...] [reps]")
      sys.exit(2)
    }
    val dirs = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-protoprobe")
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { dir =>
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val n = emb.count()
      val kSqrt = math.max(1, math.round(math.sqrt(n.toDouble)).toInt)
      def time(k: Int): Double = {
        val times = (1 to reps).map { _ =>
          spark.catalog.clearCache(); System.gc()
          val t0 = System.nanoTime()
          graft.BenchAction.run(
            graft.operators.Similarity.prototypePrune(emb, k = k, iters = 2))
          (System.nanoTime() - t0) / 1e9
        }
        spark.catalog.clearCache()
        graft.BenchAction.median(times)
      }
      val t4 = time(4)
      val ts = time(kSqrt)
      println(f"$dir%s n=$n%d k4_median=$t4%.2f ksqrt($kSqrt%d)_median=$ts%.2f")
    }
    spark.stop()
  }
}
