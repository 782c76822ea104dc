package graft.tools

/** Scratch probe for the hashed linear quality classifier's decade
  * behavior: times train (closed-form, two ≤ B-group counts over the
  * doc_id % 2 split) + score (one tokenize+hash pass against the
  * broadcast weight table) end-to-end across corpus decades, and
  * reports the weight-table row count — which must read EXACTLY B = 8192
  * at every decade (the fixed-model-size property the hashed feature
  * space exists to provide). Timing discipline is identical to
  * `graft.Bench` via the shared `graft.BenchAction`.
  *
  * Usage: ClassifierProbe <dir>[,<dir>...] [reps]
  */
object ClassifierProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.tools.ClassifierProbe <dir>[,<dir>...] [reps]")
      sys.exit(2)
    }
    val dirs = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-clfprobe")
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { dir =>
      val docs = graft.Tables.load(spark, dir, "documents")
      val n = docs.count()
      val wRows = graft.operators.CorpusOps
        .trainHashedClassifier(docs.filter("doc_id % 2 = 0"), "lang = 'en'")
        .count()
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val w = graft.operators.CorpusOps
          .trainHashedClassifier(docs.filter("doc_id % 2 = 0"), "lang = 'en'")
        graft.BenchAction.run(graft.operators.CorpusOps.hashedClassifierScore(docs, w))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      spark.catalog.clearCache()
      val med = graft.BenchAction.median(times.toList)
      println(f"$dir%s n_docs=$n%d weight_rows=$wRows%d cold_median=$med%.2f " +
        s"runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
