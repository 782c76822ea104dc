package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Scratch probe: compare count() vs noop-write timings for named queries.
  * Usage: ActionProbe <sfDir> <query>[,<query>...] */
object ActionProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
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
      // does the bench's hash-agg action survive optimization un-pruned?
      val benchDf = fn(spark, sfDir).selectExpr("bit_xor(xxhash64(struct(*))) AS h")
      val optimized = benchDf.queryExecution.optimizedPlan.toString
      println(s"$name bench-action keeps xxhash64: ${optimized.contains("xxhash64")}")
      for (round <- 1 to 2) {
        var t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val tCount = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val tNoop = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        benchDf.head()
        val tHash = (System.nanoTime() - t0) / 1e9
        println(f"$name%s r$round count=$tCount%.2f noop=$tNoop%.2f hashagg_count=$tHash%.2f")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
