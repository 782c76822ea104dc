package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Scratch probe: COLD-cache timing of the bench action for named queries
  * against an arbitrary table dir — `clearCache` + GC before each query,
  * exactly the per-query discipline of `graft.Bench`, without running the
  * whole registry. Usage: ColdProbe <sfDir> <query>[,<query>...] [reps] */
object ColdProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names, rest @ _*) = args
    val reps = rest.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    names.split(",").foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).selectExpr("bit_xor(xxhash64(struct(*))) AS h").head()
        catch { case _: Throwable =>
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      spark.catalog.clearCache()
      // true median (average the middle pair on even counts) — same
      // discipline as graft.Bench, no upper-middle bias
      val med =
        if (times.size % 2 == 1) times(times.size / 2)
        else (times(times.size / 2 - 1) + times(times.size / 2)) / 2.0
      println(f"$name%s cold_median=$med%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
