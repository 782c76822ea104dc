package graft

/** Plan inspector: prints the formatted physical plan for the named queries
  * (or a default set) against a given sf dir. Usage:
  *   tools/run.sh graft.Explain /root/testdata/sf0.01 q1_pricing_summary ...
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing_summary", "q3_segment_revenue", "q6_forecast_revenue",
        "order_wide", "uv_daily", "dedup_minhash", "ann_cosine_topk",
        "q28_asof_join", "dedup_ngram_jaccard",
        "salted_agg", "tfidf_top_terms", "pack_sequences",
        "embedding_quantize", "decontaminate_overlap", "q30_correlated_sub")
    val spark = GraftSession.build(Some("local[4]"), 4, "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
