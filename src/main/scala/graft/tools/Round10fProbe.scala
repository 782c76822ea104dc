package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe for the sixth round-10 continuation additions:
  * `hll_overlap` (sketch-only vs calibration) + `memorization_spans`
  * over the salted documents decade, `l_diversity` over in-probe
  * customer replication, and `graph_closeness` over basket replication
  * (the kcore claim: BFS cost is GRAPH-sized, not corpus-sized). Timed
  * with the `graft.Bench` discipline via `graft.BenchAction`.
  *
  * Usage: Round10fProbe [reps] [legs]   (legs: comma list of
  * docs,ldiv,graph,corr — default all)
  */
object Round10fProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.lift(0).map(_.toInt).getOrElse(3)
    val legs = args.lift(1).map(_.split(",").toSet)
      .getOrElse(Set("docs", "ldiv", "graph", "corr"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-r10fprobe")
    spark.sparkContext.setLogLevel("ERROR")

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

    if (legs("docs")) Seq("/root/testdata/sf0.1", "/tmp/graft10x", "/tmp/graft100x").foreach { dir =>
      if (new java.io.File(dir).isDirectory) {
        val docs = graft.Tables.load(spark, dir, "documents")
        val nd = docs.count()
        // sketch-only IS the 100 TB path; calibration (exact distinct +
        // pair intersect) only where the corpus-volume distinct is cheap
        val (ts, rs) = time(graft.operators.CorpusOps.hllOverlap(docs, withExact = false))
        val cal = if (nd <= 60000)
          Some(time(graft.operators.CorpusOps.hllOverlap(docs)))
        else None
        val (tm, rm) = time(graft.SparkEntry.registry("memorization_spans").fn(spark, dir))
        println(f"docs $dir%s n_docs=$nd%d hll_overlap_sketch=$ts%.2f($rs%d) " +
          f"hll_overlap_cal=${cal.map(c => f"${c._1}%.2f(${c._2}%d)").getOrElse("skip")}%s " +
          f"memorization=$tm%.2f($rm%d)")
      }
    }

    val cust = graft.Tables.load(spark, "/root/testdata/sf0.1", "customer")
    if (legs("ldiv")) Seq(1, 10, 30).foreach { k =>
      val rep = (0 until k).map(_ => cust).reduce(_ unionAll _)
      val n = rep.count()
      val (tl, rl) = time(graft.operators.CorpusOps.lDiversityProfile(
        rep.selectExpr("c_nationkey",
          "CAST(c_acctbal AS BIGINT) div 1000 AS bal_band", "c_mktsegment"),
        "c_mktsegment"))
      println(f"customers x$k%d rows=$n%d l_diversity=$tl%.2f($rl%d)")
    }

    val li = graft.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    if (legs("corr")) Seq(1, 10, 30).foreach { k =>
      val rep = (0 until k).map(_ => li).reduce(_ unionAll _)
      val n = rep.count()
      val (tc, rc) = time(graft.operators.Extras.corrMatrix(rep.selectExpr(
        "CAST(l_quantity AS BIGINT) AS qty",
        "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS disc",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c")))
      println(f"measures x$k%d rows=$n%d corr_matrix=$tc%.2f($rc%d)")
    }
    if (legs("graph")) Seq(1, 10, 30).foreach { k =>
      val rep = (0 until k).map(i => li.select(
        (col("l_orderkey") + lit(i.toLong * 10000000L)).as("l_orderkey"),
        col("l_partkey")))
        .reduce(_ unionAll _)
      val n = rep.count()
      val (tc, rc) = time {
        val lp = rep.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        val und = lp.alias("x")
          .join(lp.alias("y"), expr("x.o = y.o AND x.p < y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
        graft.operators.Graph.harmonicCloseness(und)
      }
      println(f"baskets x$k%d lines=$n%d graph_closeness=$tc%.2f($rc%d)")
    }

    spark.stop()
  }
}
