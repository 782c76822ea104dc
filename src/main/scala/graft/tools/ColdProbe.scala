package graft.tools

import graft.{SparkEntry, Tables}

/** Scratch probe: COLD-cache timing of the bench action for named queries
  * against an arbitrary table dir — `clearCache` + GC before each query,
  * exactly the per-query discipline of `graft.Bench`, without running the
  * whole registry. Usage: ColdProbe <sfDir> <query>[,<query>...] [reps] */
object ColdProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.tools.ColdProbe <sfDir> <query>[,<query>...] [reps]")
      sys.exit(2)
    }
    val Array(sfDir, names, rest @ _*) = args
    val reps = rest.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-coldprobe")
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    names.split(",").foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        // the SHARED timed action + median (graft.BenchAction): identical
        // to graft.Bench by construction, not by hand-copied convention
        graft.BenchAction.run(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      spark.catalog.clearCache()
      val med = graft.BenchAction.median(times)
      println(f"$name%s cold_median=$med%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
