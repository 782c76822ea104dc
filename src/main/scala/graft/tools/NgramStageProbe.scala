package graft.tools

/** Diagnostic: per-stage row counts + wall for dedup_ngram_jaccard's
  * pipeline so a super-linear decade probe can be attributed to a
  * specific stage (candidate volume vs gram recompute vs the verify
  * join-back) instead of guessed at. Reuses the operator's OWN stage
  * builder ([[graft.operators.Dedup.ngramPipeline]]) — one definition,
  * no copy to drift. Usage: NgramStageProbe <sfDir> */
object NgramStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-ngramprobe")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val st = graft.operators.Dedup.ngramPipeline(spark, dir)
    val nBuck = timed("bucketed rows")(st.bucketed.count())
    val nDepth = timed("bucket keys")(st.depth.count())
    val nCand = timed("candidate pairs")(st.cand.count())
    val nPruned = timed("size-pruned pairs")(st.pruned.count())
    val nOut = timed("verify stage")(st.verified.count())
    println(s"bucketed=$nBuck depthKeys=$nDepth cand=$nCand pruned=$nPruned out=$nOut")
    spark.stop()
  }
}
