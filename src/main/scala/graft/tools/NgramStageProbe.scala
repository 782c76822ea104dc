package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Diagnostic: per-stage row counts + wall for dedup_ngram_jaccard's
  * pipeline (mirrors operators/Dedup.scala:256) so a super-linear decade
  * probe can be attributed to a specific stage (candidate volume vs gram
  * recompute vs the verify join-back) instead of guessed at.
  * Usage: NgramStageProbe <sfDir> */
object NgramStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-ngramprobe")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.HashExpressions.register(spark)
    val MIX = graft.functions.Portable.MIX
    val P = graft.functions.Portable.P

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val d = Tables.load(spark, dir, "documents")
      .filter("length(text) >= 5")
      .selectExpr("doc_id", "lang", "n_chars", "graft_gram5(text) AS g")
    // r = 2 x 4-band scheme, kept in sync with operators/Dedup.scala
    val perms = (0 until 8).map(j => (MIX + 7919L * j, 12345L + 999331L * j))
    val sigExprs = perms.zipWithIndex.map { case ((a, b), j) =>
      s"array_min(transform(g, x -> (x * ${a}L + ${b}L) % ${P}L)) AS mv$j"
    }
    val bandStructs = (0 until 4).map(bq =>
      s"struct(${bq + 1} AS tag, mv${2 * bq} AS mva, mv${2 * bq + 1} AS mvb)").mkString(", ")
    val bucketed = d
      .selectExpr(Seq("doc_id", "lang", "n_chars") ++ sigExprs: _*)
      .selectExpr(Seq("doc_id", "lang") ++ (0 until 8).map(j => s"mv$j") :+
        "explode(array(CAST(n_chars / 100 AS BIGINT), CAST((n_chars + 50) / 100 AS BIGINT))) AS band": _*)
      .selectExpr("doc_id", "lang", "band", s"explode(array($bandStructs)) AS k")
      .selectExpr("doc_id", "lang", "band", "k.tag AS tag", "k.mva AS mva", "k.mvb AS mvb")
      .distinct()
    val nBuck = timed("bucketed rows")(bucketed.count())
    val bKey = Seq("lang", "band", "tag", "mva", "mvb")
    val depthOk = bucketed.groupBy(bKey.map(col): _*)
      .agg(count(lit(1)).as("df"))
      .filter("df BETWEEN 2 AND 50")
      .select(bKey.map(col): _*)
    val nDepth = timed("surviving buckets")(depthOk.count())
    val capped = bucketed.join(depthOk, bKey)
    val cand = capped.alias("a").join(capped.alias("b"),
        expr(bKey.map(c => s"a.$c = b.$c").mkString(" AND ") + " AND a.doc_id < b.doc_id"))
      .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b")
      .distinct()
    val nCand = timed("candidate pairs")(cand.count())
    val sizes = d.selectExpr("doc_id", "size(g) AS sz")
    val pruned = cand
      .join(sizes.selectExpr("doc_id AS doc_a", "sz AS sz_a"), "doc_a")
      .join(sizes.selectExpr("doc_id AS doc_b", "sz AS sz_b"), "doc_b")
      .filter("least(sz_a, sz_b) * 1.7 >= 0.7 * (sz_a + sz_b)")
      .select(col("doc_a"), col("doc_b"))
    val nPruned = timed("size-pruned pairs")(pruned.count())
    val slim = d.selectExpr("doc_id", "transform(g, x -> CAST(x AS INT)) AS g")
    val verified = pruned
      .join(slim.selectExpr("doc_id AS doc_a", "g AS g_a"), "doc_a")
      .join(slim.selectExpr("doc_id AS doc_b", "g AS g_b"), "doc_b")
      .selectExpr("doc_a", "doc_b",
        "size(array_intersect(g_a, g_b)) AS inter", "size(g_a) AS sa", "size(g_b) AS sb")
      .selectExpr("doc_a", "doc_b",
        "CAST(inter AS DOUBLE) / (sa + sb - inter) AS jaccard")
      .filter("jaccard >= 0.7")
    val nOut = timed("verify stage")(verified.count())
    println(s"bucketed=$nBuck depthOk=$nDepth cand=$nCand pruned=$nPruned out=$nOut")
    spark.stop()
  }
}
