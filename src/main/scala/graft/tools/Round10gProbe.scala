package graft.tools

import org.apache.spark.sql.functions._

/** Decade probes for the seventh-continuation operators:
  *
  *  - gov:   t_closeness + dp_counts over x1/x10/x30 row replication —
  *           both are one-corpus-fold shapes whose downstream work is
  *           class/group-domain-sized, so wall should track the scan.
  *  - quant: quantile_sketch over x1/x10/x30 lineitem replication —
  *           the sketch-only (withExact = false) path IS the 100 TB
  *           path (one combiner-perfect fold); calibration adds the
  *           value-distribution shuffle, measured separately.
  *
  * Usage: tools/run.sh graft.tools.Round10gProbe [reps] [legs]
  */
object Round10gProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.lift(0).map(_.toInt).getOrElse(3)
    val legs = args.lift(1).map(_.split(",").toSet).getOrElse(Set("gov", "quant"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-r10gprobe")
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

    if (legs("gov")) {
      val cust = graft.Tables.load(spark, "/root/testdata/sf0.1", "customer")
      val ords = graft.Tables.load(spark, "/root/testdata/sf0.1", "orders")
      Seq(1, 10, 30).foreach { k =>
        val repC = (0 until k).map(_ => cust).reduce(_ unionAll _)
        val nC = repC.count()
        val (tt, rt) = time(graft.operators.CorpusOps.tClosenessProfile(
          repC.selectExpr("c_nationkey",
            "CAST(c_acctbal AS BIGINT) div 1000 AS bal_band", "c_mktsegment"),
          "c_mktsegment"))
        val repO = (0 until k).map(_ => ords).reduce(_ unionAll _)
        val nO = repO.count()
        val (td, rd) = time(graft.operators.CorpusOps.dpCounts(
          repO.select("o_orderpriority", "o_orderstatus")))
        println(f"gov x$k%d customers=$nC%d t_closeness=$tt%.2f($rt%d) " +
          f"orders=$nO%d dp_counts=$td%.2f($rd%d)")
      }
    }

    if (legs("screen")) {
      val ords = graft.Tables.load(spark, "/root/testdata/sf0.1", "orders")
      Seq(1, 10, 30).foreach { k =>
        val rep = (0 until k).map(_ => ords).reduce(_ unionAll _)
        val n = rep.count()
        val vals = rep.selectExpr("o_orderpriority AS prio",
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x")
        val (tb, rb) = time(graft.operators.CorpusOps.benfordScreen(vals, "x"))
        val (tm, rm) = time(graft.operators.CorpusOps.madOutliers(vals, "x",
          kMilli = 2000L))
        println(f"screen x$k%d orders=$n%d benford=$tb%.2f($rb%d) mad=$tm%.2f($rm%d)")
      }
      // classifier_auc rides the documents corpus decades (the salted
      // corpora from the classifier probes)
      Seq("/root/testdata/sf0.1", "/tmp/graft10x", "/tmp/graft100x").foreach { dir =>
        if (new java.io.File(dir).isDirectory) {
          val d = graft.Tables.load(spark, dir, "documents")
          val nd = d.count()
          val (ta, ra) = time {
            val w = graft.operators.CorpusOps.trainHashedClassifier(
              d.filter("doc_id % 2 = 0"), posExpr = "lang = 'en'")
            graft.operators.CorpusOps.classifierAuc(
              graft.operators.CorpusOps.hashedClassifierScore(
                d.filter("doc_id % 2 = 1"), w), labelExpr = "lang = 'en'")
          }
          println(f"auc $dir%s n_docs=$nd%d classifier_auc=$ta%.2f($ra%d)")
        }
      }
    }

    if (legs("dq")) {
      val ords = graft.Tables.load(spark, "/root/testdata/sf0.1", "orders")
      val cust = graft.Tables.load(spark, "/root/testdata/sf0.1", "customer")
      Seq(1, 10, 30).foreach { k =>
        val rep = (0 until k).map(_ => ords).reduce(_ unionAll _)
        val n = rep.count()
        val (tp, rp) = time(graft.operators.Extras.tableProfile(rep))
        val (tf, rf) = time(graft.operators.Extras.fkIntegrity(
          rep, "o_custkey", cust, "c_custkey"))
        println(f"dq x$k%d orders=$n%d table_profile=$tp%.2f($rp%d) " +
          f"fk_integrity=$tf%.2f($rf%d)")
      }
      Seq("/root/testdata/sf0.1", "/tmp/graft10x", "/tmp/graft100x").foreach { dir =>
        if (new java.io.File(dir).isDirectory) {
          val names = Seq("ndcg_eval", "map_eval")
          val rs = names.map { nq =>
            val (t, r) = time(graft.SparkEntry.registry(nq).fn(spark, dir))
            f"$nq=$t%.2f($r%d)"
          }
          println(s"evals $dir ${rs.mkString(" ")}")
        }
      }
    }

    if (legs("quant")) {
      val li = graft.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
      Seq(1, 10, 30).foreach { k =>
        val rep = (0 until k).map(_ => li).reduce(_ unionAll _)
        val n = rep.count()
        val vals = rep.selectExpr("l_returnflag AS flag",
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x")
        val (ts, rs) = time(graft.operators.CorpusOps.quantileSketch(
          vals, "x", withExact = false))
        val (tc, rc) = time(graft.operators.CorpusOps.quantileSketch(vals, "x"))
        println(f"quant x$k%d lines=$n%d sketch_only=$ts%.2f($rs%d) " +
          f"calibration=$tc%.2f($rc%d)")
      }
    }

    spark.stop()
  }
}
