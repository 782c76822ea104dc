package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The parameterized scale-probe harness — one entry point for every
  * decade measurement in SCALE.md (replacing the per-round
  * Round10[b-g]Probe accretion). Legs are keyed by name; every leg uses
  * the `graft.Bench` timing discipline (clearCache + GC per rep, median
  * of reps, row count reported once) via `graft.BenchAction`.
  *
  * Usage: tools/run.sh graft.tools.Probe <leg>[,<leg>...] [dirs] [reps]
  *
  *  - reg:<q1+q2+...>  any registry queries, timed per dir in [dirs]
  *  - pretrain         pretrain_prep with a fixed (base-stride) eval pool
  *  - hll              hll_distinct + hll_overlap sketch-vs-calibration
  *                     and memorization_spans per docs dir
  *  - auc              train + score + classifier_auc per docs dir
  *  - baskets          basket_rules / zorder / kcore over x1/x10/x30
  *                     lineitem replication (item domain fixed)
  *  - sales            inventory_abc / gini over x1/x10/x30
  *  - assort           graph assortativity over basket replication
  *  - closeness        sampled harmonic closeness over basket replication
  *  - ldiv             l_diversity over customer replication
  *  - corr             corr_matrix over lineitem replication
  *  - gov              t_closeness + dp_counts over replication
  *  - screen           benford + mad over orders replication
  *  - dq               table_profile + fk_integrity over replication,
  *                     ndcg/map per dir
  *  - quant            quantile_sketch sketch-only vs calibration
  *  - dpp              dynamic partition pruning: files read with the
  *                     DPP subquery vs with pruning disabled, on a
  *                     month-partitioned copy of each dir's orders
  *
  * Replication legs read sf0.1 fixtures (the SCALE.md decade
  * discipline); registry/docs legs run on the dirs argument
  * (default sf0.1).
  */
object Probe {

  private val Decades = Seq(1, 10, 30)

  /** Shared recall-metric block behind the starrecall and sweeprecall
    * legs: pair counts, keep-first drop sets, and connected-component
    * agreement of the bounded emitters vs all-pairs on ONE corpus.
    * Component semantics: star/capped edges are subsets, so their
    * partitions REFINE all-pairs'; we count the all-pairs clusters the
    * bounded partition splits and the docs affected. Docs absent from
    * the bounded graph are singletons (cluster_id = doc_id). The
    * all-pairs CC — the dominant cost on a saturated corpus — is
    * computed ONCE and shared by both reports. Persists the three slim
    * pair frames; unpersists everything before returning. */
  private def recallReport(all0: DataFrame, star0: DataFrame,
      capped0: DataFrame): String = {
    def slim(df: DataFrame) = df.select(col("doc_a"), col("doc_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val all = slim(all0); val star = slim(star0); val capped = slim(capped0)
    val (nAll, nStar, nCap) = (all.count(), star.count(), capped.count())
    def dropCount(df: DataFrame) = df.select(col("doc_b")).distinct().count()
    val (dAll, dStar, dCap) = (dropCount(all), dropCount(star), dropCount(capped))
    val ca = graft.operators.Curation.connectedComponents(all)
      .select(col("doc_id"), col("cluster_id").as("c_all"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def splitReport(sub: DataFrame): (Long, Long, Long) = {
      val cs = graft.operators.Curation.connectedComponents(sub)
        .select(col("doc_id"), col("cluster_id").as("c_sub"))
      val j = ca.join(cs, Seq("doc_id"), "left")
        .selectExpr("c_all", "coalesce(c_sub, doc_id) AS c_sub")
      val perCluster = j.groupBy(col("c_all"))
        .agg(countDistinct(col("c_sub")).as("parts"), count(lit(1)).as("docs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val total = perCluster.count()
      val split = perCluster.filter("parts > 1")
      val r = split.agg(coalesce(count(lit(1)), lit(0L)).as("nc"),
        coalesce(sum(col("docs")), lit(0L)).as("nd")).collect()(0)
      perCluster.unpersist()
      (total, r.getAs[Long]("nc"), r.getAs[Long]("nd"))
    }
    val (ncAll, splitStar, docsStar) = splitReport(star)
    val (_, splitCap, docsCap) = splitReport(capped)
    val out = f"pairs all=$nAll%d star=$nStar%d capped=$nCap%d " +
      f"drops all=$dAll%d star=$dStar%d capped=$dCap%d " +
      f"clusters=$ncAll%d split_star=$splitStar%d docs_in_split_star=$docsStar%d " +
      f"split_capped=$splitCap%d docs_in_split_capped=$docsCap%d"
    Seq(all, star, capped, ca).foreach(_.unpersist())
    out
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: graft.tools.Probe <leg>[,<leg>...] [dirs] [reps]")
      sys.exit(2)
    }
    val legs = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dirs = args.lift(1).map(_.split(",").toSeq.map(_.trim))
      .getOrElse(Seq("/root/testdata/sf0.1")).filter(_.nonEmpty)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    // fail LOUDLY at parse time: reps = 0 would otherwise produce an empty
    // sample (and NPE in the legs that collect a row inside the timed loop)
    require(reps >= 1, s"reps must be >= 1, got $reps")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-probe")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.HashExpressions.register(spark)

    def time(mk: => DataFrame): (Double, Long) = {
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
    def fmt(name: String, t: Double, r: Long) = f"$name=$t%.2f($r%d)"
    def lineitem = graft.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    def customer = graft.Tables.load(spark, "/root/testdata/sf0.1", "customer")
    def ordersSf = graft.Tables.load(spark, "/root/testdata/sf0.1", "orders")
    def repN(df: DataFrame, k: Int): DataFrame =
      (0 until k).map(_ => df).reduce(_ unionAll _)
    /** lineitem baskets replicated with DISTINCT order keys (item domain
      * fixed, basket count scales) — the co-purchase graph substrate. */
    def basketsX(k: Int): DataFrame =
      (0 until k).map(i => lineitem.select(
        (col("l_orderkey") + lit(i.toLong * 10000000L)).as("o"),
        col("l_partkey").as("p"), col("l_suppkey").as("s")))
        .reduce(_ unionAll _)
    def copurchase(rep: DataFrame): DataFrame = {
      val lp = rep.select(col("o"), col("p")).distinct()
      lp.alias("x").join(lp.alias("y"), expr("x.o = y.o AND x.p < y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
    }

    legs.foreach {
      case l if l.startsWith("reg:") =>
        val names = l.stripPrefix("reg:").split("\\+").toSeq.filter(_.nonEmpty)
        dirs.foreach { dir =>
          val rs = names.map { nq =>
            val (t, r) = time(graft.SparkEntry.registry(nq).fn(spark, dir))
            fmt(nq, t, r)
          }
          println(s"reg $dir ${rs.mkString(" ")}")
        }

      // pretrain_prep with the FIXED (base-stride-bounded) eval pool: the
      // registry's %97 stand-in pool grows with the corpus and saturates
      // the salted decades' trigram space (clean=0, stages 5-7 idle);
      // a real benchmark is fixed-size, so the decade wall is measured
      // with all seven stages doing production-shaped work. The pool
      // bound is Pretrain.FixedEvalPool — the shared SaltStride constant,
      // which build_salted_corpus.py asserts its id domain stays below.
      case "pretrain" => dirs.foreach { dir =>
        val (t, r) = time(graft.operators.Pretrain.pretrainPrep(spark, dir,
          evalPoolExpr = graft.operators.Pretrain.FixedEvalPool))
        println(s"pretrain $dir ${fmt("pretrain_prep_fixedpool", t, r)}")
      }

      // the capstone with the star dedup knob engaged (fixed pool too):
      // the configuration the bucket-load profiler's verdict selects on
      // a duplicate-saturated corpus — the only one whose K=1000 decade
      // leg fits on a single box (linear vs quadratic candidates)
      case "pretrainstar" => dirs.foreach { dir =>
        val (t, r) = time(graft.operators.Pretrain.pretrainPrep(spark, dir,
          evalPoolExpr = graft.operators.Pretrain.FixedEvalPool,
          dedupEmitter = "star"))
        println(s"pretrainstar $dir ${fmt("pretrain_prep_star", t, r)}")
      }

      // the capstone with dedupEmitter = "auto", decade-proven: report
      // the rung chooseEmitter selects on the EXACT frame the dispatch
      // profiles (the stage-2 exact-dedup survivors, via the shared
      // Pretrain.gateAndExactDedup definition — no hand copy to drift),
      // then run the auto capstone to completion. Expected ladder on the
      // salted corpora: 10× (mid-saturation, max_bucket ~180) → capped;
      // K=1000 (capped candidates ~1.14 B > the 200 M one-unit budget)
      // → star. The timed run INCLUDES the eager profile pass — that is
      // what auto costs.
      case "pretrainauto" => dirs.foreach { dir =>
        spark.catalog.clearCache()
        val (_, _, ekDocs) = graft.operators.Pretrain.gateAndExactDedup(spark, dir)
        val rung = graft.operators.Dedup.chooseEmitter(ekDocs.select("doc_id", "text"))
        spark.catalog.clearCache()
        val (t, r) = time(graft.operators.Pretrain.pretrainPrep(spark, dir,
          evalPoolExpr = graft.operators.Pretrain.FixedEvalPool,
          dedupEmitter = "auto"))
        println(s"pretrainauto $dir rung=$rung ${fmt("pretrain_prep_auto", t, r)}")
      }

      // LSH bucket-load profile per dir: the candidate volume the MinHash
      // pair emitter would pay (quadratic in bucket occupancy) — the
      // decade evidence behind the round-13 capstone-at-1000x finding
      case "lshload" => dirs.foreach { dir =>
        // deliberately NOT the shared time() helper: its trailing count()
        // would re-run this expensive aggregation a full extra time for a
        // known-1-row result — collect the row inside the timed reps
        var row: org.apache.spark.sql.Row = null
        val times = (1 to reps).map { _ =>
          spark.catalog.clearCache(); System.gc()
          val t0 = System.nanoTime()
          row = graft.SparkEntry.registry("dedup_minhash_profile")
            .fn(spark, dir).collect()(0)
          (System.nanoTime() - t0) / 1e9
        }
        spark.catalog.clearCache()
        val t = graft.BenchAction.median(times)
        println(f"lshload $dir%s n_buckets=${row.getAs[Long]("n_buckets")}%d " +
          f"max_bucket=${row.getAs[Long]("max_bucket")}%d " +
          f"cand_pairs=${row.getAs[Long]("cand_pairs")}%d " +
          f"cand_star=${row.getAs[Long]("cand_pairs_star")}%d " +
          f"cand_capped=${row.getAs[Long]("cand_pairs_capped")}%d t=$t%.2f")
      }

      // star/capped emitter recall vs all-pairs on the SAME corpus: pair
      // recall, keep-first drop-set agreement, and connected-component
      // agreement (how many all-pairs clusters the bounded emitters
      // split) — the measured recall cost behind the A~B,B~C keep-first
      // divergence documented on bandedCandidatesStar
      case "starrecall" => dirs.foreach { dir =>
        def q(n: String) = graft.SparkEntry.registry(n).fn(spark, dir)
        println(s"starrecall $dir " + recallReport(
          q("dedup_minhash"), q("dedup_minhash_star"), q("dedup_minhash_capped")))
        spark.catalog.clearCache()
      }

      // bounded-emitter recall at every band-sweep grid point: the
      // minhash_band_sweep registry entry prices candidate VOLUME at all
      // 9 (nb × w, emitter) points; this leg adds the round-14 RECALL
      // protocol — pair counts, keep-first drop-set agreement, cluster
      // splits vs the all-pairs emitter AT THE SAME SPLIT — for the
      // non-4×4 splits, so a caller retuning bands for recall reads
      // volume AND recall per grid point (SCALE.md gets the table).
      case "sweeprecall" => dirs.foreach { dir =>
        val docs = graft.Tables.load(spark, dir, "documents")
        graft.operators.Dedup.bandSweepCfgs.foreach { case (nb, w) =>
          val rep = recallReport(
            graft.operators.Dedup.minhashPairsOf(docs, nb, w),
            graft.operators.Dedup.minhashPairsStarOf(docs, nb, w),
            graft.operators.Dedup.minhashPairsCappedOf(docs, nb = nb, w = w))
          println(s"sweeprecall $dir nb=$nb w=$w $rep")
          spark.catalog.clearCache()
        }
      }

      case "hll" => dirs.foreach { dir =>
        val docs = graft.Tables.load(spark, dir, "documents")
        val nd = docs.count()
        val (ts, rs) = time(graft.operators.CorpusOps.hllDistinct(docs, withExact = false))
        val (to, ro) = time(graft.operators.CorpusOps.hllOverlap(docs, withExact = false))
        val cal = if (nd <= 60000) {
          val (tc, rc) = time(graft.operators.CorpusOps.hllDistinct(docs))
          val (tq, rq) = time(graft.operators.CorpusOps.hllOverlap(docs))
          s" ${fmt("hll_calib", tc, rc)} ${fmt("overlap_calib", tq, rq)}"
        } else " calib=skip"
        val (tm, rm) = time(graft.SparkEntry.registry("memorization_spans").fn(spark, dir))
        println(s"hll $dir n_docs=$nd ${fmt("hll_sketch", ts, rs)} " +
          s"${fmt("overlap_sketch", to, ro)}$cal ${fmt("memorization", tm, rm)}")
      }

      case "auc" => dirs.foreach { dir =>
        val d = graft.Tables.load(spark, dir, "documents")
        val nd = d.count()
        val (ta, ra) = time {
          val w = graft.operators.CorpusOps.trainHashedClassifier(
            d.filter("doc_id % 2 = 0"), posExpr = "lang = 'en'")
          graft.operators.CorpusOps.classifierAuc(
            graft.operators.CorpusOps.hashedClassifierScore(
              d.filter("doc_id % 2 = 1"), w), labelExpr = "lang = 'en'")
        }
        println(s"auc $dir n_docs=$nd ${fmt("classifier_auc", ta, ra)}")
      }

      case "baskets" => Decades.foreach { k =>
        val rep = basketsX(k)
        val nb = rep.count()
        val (tb, rb) = time(graft.operators.Extras.basketRules(
          rep.selectExpr("o AS basket", "p AS item")))
        val (tz, rz) = time(graft.operators.Curation.zorderLayout(
          rep.selectExpr("CAST(p AS BIGINT) & 65535 AS x",
            "CAST(s AS BIGINT) & 65535 AS y")))
        val (tk, rk) = time(graft.operators.Graph.kcore(copurchase(rep), k = 80, rounds = 3))
        println(s"baskets x$k rows=$nb ${fmt("basket_rules", tb, rb)} " +
          s"${fmt("zorder", tz, rz)} ${fmt("kcore", tk, rk)}")
      }

      case "sales" => Decades.foreach { k =>
        val rep = repN(lineitem.select(col("l_partkey"), col("l_extendedprice")), k)
        val n = rep.count()
        val sales = rep.selectExpr("l_partkey AS item",
          "CAST(l_extendedprice AS DECIMAL(18,2)) AS price")
        val (ti, ri) = time(graft.operators.Extras.inventoryAbc(sales))
        val (tg, rg) = time(graft.operators.Extras.giniConcentration(sales))
        println(s"sales x$k rows=$n ${fmt("inventory_abc", ti, ri)} ${fmt("gini", tg, rg)}")
      }

      case "assort" => Decades.foreach { k =>
        val (ta, ra) = time(graft.operators.Graph.assortativity(copurchase(basketsX(k))))
        println(s"baskets x$k ${fmt("assortativity", ta, ra)}")
      }

      case "closeness" => Decades.foreach { k =>
        val rep = basketsX(k)
        val n = rep.count()
        val (tc, rc) = time(graft.operators.Graph.harmonicCloseness(copurchase(rep)))
        println(s"baskets x$k lines=$n ${fmt("graph_closeness", tc, rc)}")
      }

      case "ldiv" => Decades.foreach { k =>
        val rep = repN(customer, k)
        val n = rep.count()
        val (tl, rl) = time(graft.operators.CorpusOps.lDiversityProfile(
          rep.selectExpr("c_nationkey",
            "CAST(c_acctbal AS BIGINT) div 1000 AS bal_band", "c_mktsegment"),
          "c_mktsegment"))
        println(s"customers x$k rows=$n ${fmt("l_diversity", tl, rl)}")
      }

      case "corr" => Decades.foreach { k =>
        val rep = repN(lineitem, k)
        val n = rep.count()
        val (tc, rc) = time(graft.operators.Extras.corrMatrix(rep.selectExpr(
          "CAST(l_quantity AS BIGINT) AS qty",
          "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS disc",
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c")))
        println(s"measures x$k rows=$n ${fmt("corr_matrix", tc, rc)}")
      }

      case "gov" => Decades.foreach { k =>
        val repC = repN(customer, k)
        val nC = repC.count()
        val (tt, rt) = time(graft.operators.CorpusOps.tClosenessProfile(
          repC.selectExpr("c_nationkey",
            "CAST(c_acctbal AS BIGINT) div 1000 AS bal_band", "c_mktsegment"),
          "c_mktsegment"))
        val repO = repN(ordersSf, k)
        val nO = repO.count()
        val (td, rd) = time(graft.operators.CorpusOps.dpCounts(
          repO.select("o_orderpriority", "o_orderstatus")))
        println(s"gov x$k customers=$nC ${fmt("t_closeness", tt, rt)} " +
          s"orders=$nO ${fmt("dp_counts", td, rd)}")
      }

      case "screen" => Decades.foreach { k =>
        val rep = repN(ordersSf, k)
        val n = rep.count()
        val vals = rep.selectExpr("o_orderpriority AS prio",
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x")
        val (tb, rb) = time(graft.operators.CorpusOps.benfordScreen(vals, "x"))
        val (tm, rm) = time(graft.operators.CorpusOps.madOutliers(vals, "x", kMilli = 2000L))
        println(s"screen x$k orders=$n ${fmt("benford", tb, rb)} ${fmt("mad", tm, rm)}")
      }

      case "dq" =>
        Decades.foreach { k =>
          val rep = repN(ordersSf, k)
          val n = rep.count()
          val (tp, rp) = time(graft.operators.Extras.tableProfile(rep))
          val (tf, rf) = time(graft.operators.Extras.fkIntegrity(
            rep, "o_custkey", customer, "c_custkey"))
          println(s"dq x$k orders=$n ${fmt("table_profile", tp, rp)} " +
            s"${fmt("fk_integrity", tf, rf)}")
        }
        dirs.foreach { dir =>
          val rs = Seq("ndcg_eval", "map_eval").map { nq =>
            val (t, r) = time(graft.SparkEntry.registry(nq).fn(spark, dir))
            fmt(nq, t, r)
          }
          println(s"evals $dir ${rs.mkString(" ")}")
        }

      case "quant" => Decades.foreach { k =>
        val rep = repN(lineitem, k)
        val n = rep.count()
        val vals = rep.selectExpr("l_returnflag AS flag",
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x")
        val (ts, rs) = time(graft.operators.CorpusOps.quantileSketch(vals, "x", withExact = false))
        val (tc, rc) = time(graft.operators.CorpusOps.quantileSketch(vals, "x"))
        println(s"quant x$k lines=$n ${fmt("sketch_only", ts, rs)} " +
          s"${fmt("calibration", tc, rc)}")
      }

      case "dpp" => dirs.foreach { dir =>
        val base = java.nio.file.Files.createTempDirectory("graft_dpp").toString
        spark.read.parquet(s"$dir/orders.parquet")
          .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
          .write.mode("overwrite").partitionBy("o_month").parquet(s"$base/orders")
        spark.read.parquet(s"$base/orders").select(col("o_month")).distinct()
          .withColumn("season", expr(
            "IF(substring(o_month, 6, 2) IN ('11', '12'), 'peak', 'base')"))
          .write.mode("overwrite").parquet(s"$base/months")
        def run(dpp: Boolean): (Long, Long, Long, Double) = {
          spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", dpp.toString)
          val t0 = System.nanoTime()
          val q = spark.read.parquet(s"$base/orders")
            .join(spark.read.parquet(s"$base/months")
              .filter(col("season") === "peak"), "o_month")
            .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("rev"))
          val n = q.collect()(0).getLong(0)
          val el = (System.nanoTime() - t0) / 1e9
          def scans(p: org.apache.spark.sql.execution.SparkPlan)
              : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
            case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              scans(a.executedPlan)
            case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              scans(qs.plan)
            case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
              scans(r.child)
          }.flatten
          val fs = scans(q.queryExecution.executedPlan)
            .filter(_.metadata.get("Location").exists(_.contains("/orders")))
          (fs.map(_.metrics("numFiles").value).sum,
            fs.map(_.metrics("filesSize").value).sum, n, el)
        }
        val (fOn, bOn, nOn, tOn) = run(dpp = true)
        val (fOff, bOff, nOff, tOff) = run(dpp = false)
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
        require(nOn == nOff, s"pruning changed the answer: $nOn vs $nOff")
        println(f"dpp $dir%s rows=$nOn%d dpp_on: files=$fOn%d bytes=$bOn%d t=$tOn%.2f " +
          f"dpp_off: files=$fOff%d bytes=$bOff%d t=$tOff%.2f")
      }

      case other =>
        System.err.println(s"unknown probe leg: $other")
        sys.exit(2)
    }
    spark.stop()
  }
}
