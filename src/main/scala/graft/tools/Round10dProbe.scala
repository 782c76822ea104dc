package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe for the third round-10 continuation additions.
  *
  * Three sections, one per substrate:
  *  - documents decades (salted dirs): `hll_distinct` BOTH ways — the
  *    registry calibration (withExact = true, pays the distinct shuffle)
  *    vs the sketch-only path (withExact = false) whose gap IS the
  *    sketch's reason to exist;
  *  - basket decades (in-probe replication of lineitem with orderkey
  *    offsets — lineitem is symlinked constant across the salted dirs):
  *    `basket_rules`, `zorder_layout`, `graph_kcore`. Replicated baskets
  *    keep the item domain fixed: basket_rules' pair volume scales
  *    linearly in baskets, kcore's DISTINCT edge set stays constant (the
  *    graph-sized-not-corpus-sized claim), zorder is scan-bound;
  *  - orders/events decade (sf0.01 → graft10x: 15k → 150k orders,
  *    10k → 100k events): `rfm_segments`, `ab_test_chi2`, `scd2_history`.
  *
  * Timed with the `graft.Bench` discipline via `graft.BenchAction`.
  * Usage: Round10dProbe <docsDir>[,<docsDir>...] <ordersDir>[,...] [reps]
  */
object Round10dProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: graft.tools.Round10dProbe <docsDirs> <ordersDirs> [reps]")
      sys.exit(2)
    }
    val docDirs = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val ordDirs = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-r10dprobe")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.HashExpressions.register(spark)

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

    docDirs.foreach { dir =>
      val docs = graft.Tables.load(spark, dir, "documents")
      val nd = docs.count()
      val (tc, rc) = time(graft.operators.CorpusOps.hllDistinct(docs))
      val (ts, rs) = time(graft.operators.CorpusOps.hllDistinct(docs, withExact = false))
      println(f"docs $dir%s n_docs=$nd%d hll_calib=$tc%.2f($rc%d) hll_sketch=$ts%.2f($rs%d)")
    }

    val li = graft.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    Seq(1, 10, 30).foreach { k =>
      val rep = (0 until k).map(i => li.select(
        (col("l_orderkey") + lit(i.toLong * 10000000L)).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey")))
        .reduce(_ unionAll _)
      val nb = rep.count()
      val (tb, rb) = time(graft.operators.Extras.basketRules(
        rep.selectExpr("l_orderkey AS basket", "l_partkey AS item")))
      val (tz, rz) = time(graft.operators.Curation.zorderLayout(
        rep.selectExpr("CAST(l_partkey AS BIGINT) & 65535 AS x",
          "CAST(l_suppkey AS BIGINT) & 65535 AS y")))
      val (tk, rk) = time {
        val lp = rep.selectExpr("l_orderkey AS o", "l_partkey AS p").distinct()
        val und = lp.alias("x")
          .join(lp.alias("y"), expr("x.o = y.o AND x.p < y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
        graft.operators.Graph.kcore(und, k = 80, rounds = 3)
      }
      println(f"baskets x$k%d rows=$nb%d basket_rules=$tb%.2f($rb%d) " +
        f"zorder=$tz%.2f($rz%d) kcore=$tk%.2f($rk%d)")
    }

    ordDirs.foreach { dir =>
      val no = graft.Tables.load(spark, dir, "orders").count()
      val ne = graft.Tables.load(spark, dir, "events").count()
      def q(name: String) = graft.SparkEntry.registry(name).fn(spark, dir)
      val (tr, rr) = time(q("rfm_segments"))
      val (ta, ra) = time(q("ab_test_chi2"))
      val (ts, rs) = time(q("scd2_history"))
      println(f"orders $dir%s n_orders=$no%d n_events=$ne%d rfm=$tr%.2f($rr%d) " +
        f"ab=$ta%.2f($ra%d) scd2=$ts%.2f($rs%d)")
    }
    spark.stop()
  }
}
