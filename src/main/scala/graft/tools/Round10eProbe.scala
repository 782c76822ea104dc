package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe for the fifth round-10 continuation additions:
  * `cohort_ltv` + `attribution_linear` over the orders/events decade
  * (sf0.01 → graft10x), `inventory_abc` over in-probe lineitem
  * replication (sales volume scales, the item domain — and therefore
  * the ranking window's input — stays fixed). Timed with the
  * `graft.Bench` discipline via `graft.BenchAction`.
  *
  * Usage: Round10eProbe <ordersDir>[,<ordersDir>...] [reps]
  */
object Round10eProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.tools.Round10eProbe <ordersDirs> [reps]")
      sys.exit(2)
    }
    val ordDirs = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-r10eprobe")
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

    ordDirs.foreach { dir =>
      val no = graft.Tables.load(spark, dir, "orders").count()
      val ne = graft.Tables.load(spark, dir, "events").count()
      def q(name: String) = graft.SparkEntry.registry(name).fn(spark, dir)
      val (tl, rl) = time(q("cohort_ltv"))
      val (ta, ra) = time(q("attribution_linear"))
      println(f"orders $dir%s n_orders=$no%d n_events=$ne%d " +
        f"cohort_ltv=$tl%.2f($rl%d) attribution=$ta%.2f($ra%d)")
    }

    Seq("/root/testdata/sf0.1", "/tmp/graft10x", "/tmp/graft100x").foreach { dir =>
      if (new java.io.File(dir).isDirectory) {
        val docs = graft.Tables.load(spark, dir, "documents")
        val nd = docs.count()
        val (tr, rr) = time(graft.operators.TextOps.textReadability(docs))
        val (tc, rc) = time(graft.operators.TextOps.codeDetect(docs))
        println(f"docs $dir%s n_docs=$nd%d readability=$tr%.2f($rr%d) " +
          f"code_detect=$tc%.2f($rc%d)")
      }
    }

    val li = graft.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    Seq(1, 10, 30).foreach { k =>
      val rep = (0 until k).map(_ => li.select(col("l_partkey"), col("l_extendedprice")))
        .reduce(_ unionAll _)
      val n = rep.count()
      val (ti, ri) = time(graft.operators.Extras.inventoryAbc(
        rep.selectExpr("l_partkey AS item",
          "CAST(l_extendedprice AS DECIMAL(18,2)) AS price")))
      val (tg, rg) = time(graft.operators.Extras.giniConcentration(
        rep.selectExpr("l_partkey AS item",
          "CAST(l_extendedprice AS DECIMAL(18,2)) AS price")))
      println(f"sales x$k%d rows=$n%d inventory_abc=$ti%.2f($ri%d) gini=$tg%.2f($rg%d)")
    }

    val li2 = graft.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    Seq(1, 10, 30).foreach { k =>
      val rep = (0 until k).map(i => li2.select(
        (col("l_orderkey") + lit(i.toLong * 10000000L)).as("o"),
        col("l_partkey").as("p")))
        .reduce(_ unionAll _)
      val (ta, ra) = time {
        val lp = rep.distinct()
        val und = lp.alias("x")
          .join(lp.alias("y"), expr("x.o = y.o AND x.p < y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
        graft.operators.Graph.assortativity(und)
      }
      println(f"baskets x$k%d assortativity=$ta%.2f($ra%d)")
    }
    spark.stop()
  }
}
