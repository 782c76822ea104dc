package graft.tools

/** Scratch probe for the round-10 continuation additions:
  * `lm_trigram_score` (model = three passes over the cached train-token
  * frame; scoring = tri + two bigram shuffle joins), `dedup_winnow`
  * (map-side selection, fp hash-group, two-tier df-capped pairing —
  * the salted corpora are duplicate-SATURATED, so this is the hub-tier
  * stress test), `rare_token_docs` (distinct census + vocab-keyed
  * join-back) and `curriculum_plan` (distribution cutoffs + per-(stage,
  * shard) ranks). Timed across the salted corpus decades with the
  * `graft.Bench` discipline via `graft.BenchAction`.
  *
  * Usage: Round10bProbe <dir>[,<dir>...] [reps]
  */
object Round10bProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.tools.Round10bProbe <dir>[,<dir>...] [reps]")
      sys.exit(2)
    }
    val dirs = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-r10bprobe")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.HashExpressions.register(spark)
    dirs.foreach { dir =>
      val docs = graft.Tables.load(spark, dir, "documents")
      val n = docs.count()
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
      val (tt, rt) = time(graft.operators.TextOps.lmTrigramScore(docs))
      val (tw, rw) = time(graft.operators.Dedup.winnowPairs(docs))
      val (tr, rr) = time(graft.operators.CorpusOps.rareTokenDocs(docs))
      val (tc, rc) = time(graft.operators.Curation.curriculumPlan(
        docs.selectExpr("doc_id",
          s"CAST(size(${graft.functions.Portable.tokensSql("coalesce(text, '')")}) AS BIGINT) AS score")))
      val (tp, rp) = time(graft.SparkEntry.registry("ts_changepoint").fn(spark, dir))
      println(f"$dir%s n_docs=$n%d trigram=$tt%.2f($rt%d) winnow=$tw%.2f($rw%d) " +
        f"rare=$tr%.2f($rr%d) curriculum=$tc%.2f($rc%d) changepoint=$tp%.2f($rp%d)")
    }
    spark.stop()
  }
}
