package graft.tools

/** Scratch probe for the second round-10 continuation additions:
  * `pmi_collocations` (pair hash-group pruned by min-count before the
  * vocab joins), `dedup_edit_blocked` (blocking + Levenshtein verify —
  * the salted corpora are duplicate-SATURATED, so the block-depth hub
  * tier is the stress path), `chinchilla_plan` (one corpus count),
  * `ts_acf` and `target_encode_loo` (orders-volume: pre-agg / category
  * broadcast). Document ops scale with the salted corpus decades;
  * the orders ops scale with the sf0.01 → graft10x orders decade
  * (orders are symlinked constant in the salted dirs). Timed with the
  * `graft.Bench` discipline via `graft.BenchAction`.
  *
  * Usage: Round10cProbe <dir>[,<dir>...] [reps]
  */
object Round10cProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.tools.Round10cProbe <dir>[,<dir>...] [reps]")
      sys.exit(2)
    }
    val dirs = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-r10cprobe")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.HashExpressions.register(spark)
    dirs.foreach { dir =>
      val docs = graft.Tables.load(spark, dir, "documents")
      val nd = docs.count()
      val no = graft.Tables.load(spark, dir, "orders").count()
      def time(mk: => org.apache.spark.sql.DataFrame): (Double, Long) = {
        val times = (1 to reps).map { _ =>
          spark.catalog.clearCache(); System.gc()
          val t0 = System.nanoTime()
          graft.BenchAction.run(mk)
          (System.nanoTime() - t0) / 1e9
        }
        spark.catalog.clearCache()
        val rows = mk.count()
        spark.catalog.clearCache()
        (graft.BenchAction.median(times), rows)
      }
      def q(name: String) = graft.SparkEntry.registry(name).fn(spark, dir)
      val (tp, rp) = time(graft.operators.CorpusOps.pmiCollocations(docs))
      val (te, re) = time(graft.operators.Dedup.editBlockedPairs(docs))
      val (tc, rc) = time(graft.operators.Curation.chinchillaPlan(docs))
      val (ta, ra) = time(q("ts_acf"))
      val (tt, rt) = time(q("target_encode_loo"))
      println(f"$dir%s n_docs=$nd%d n_orders=$no%d pmi=$tp%.2f($rp%d) " +
        f"edit=$te%.2f($re%d) chinchilla=$tc%.2f($rc%d) acf=$ta%.2f($ra%d) " +
        f"target=$tt%.2f($rt%d)")
    }
    spark.stop()
  }
}
