package graft.tools

/** Scratch probe for the two round-10 document-side additions:
  * `corpus_diversity` (one tokenize pass + the (source, n, fp)
  * hash-group — the distinct census is the only corpus-volume shuffle,
  * output flat at 3·|sources| rows) and `mix_unimax` (one tokenize+count
  * pass; every waterfilling stage after it is |sources|-row
  * model-sized). Timed across the salted corpus decades with the
  * `graft.Bench` discipline via `graft.BenchAction`.
  *
  * Usage: DiversityProbe <dir>[,<dir>...] [reps]
  */
object DiversityProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.tools.DiversityProbe <dir>[,<dir>...] [reps]")
      sys.exit(2)
    }
    val dirs = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-divprobe")
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { dir =>
      val docs = graft.Tables.load(spark, dir, "documents")
      val n = docs.count()
      val outRows = graft.operators.CorpusOps.corpusDiversity(docs).count()
      def time(mk: => org.apache.spark.sql.DataFrame): Double = {
        val times = (1 to reps).map { _ =>
          spark.catalog.clearCache(); System.gc()
          val t0 = System.nanoTime()
          graft.BenchAction.run(mk)
          (System.nanoTime() - t0) / 1e9
        }
        spark.catalog.clearCache()
        graft.BenchAction.median(times)
      }
      val td = time(graft.operators.CorpusOps.corpusDiversity(docs))
      val tu = time(graft.operators.Curation.mixUnimax(docs))
      println(f"$dir%s n_docs=$n%d diversity_rows=$outRows%d " +
        f"diversity_median=$td%.2f unimax_median=$tu%.2f")
    }
    spark.stop()
  }
}
