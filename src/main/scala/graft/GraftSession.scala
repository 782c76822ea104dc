package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-tuned defaults.
  *
  * The same builder serves local verification (`local[N]`, N shuffle
  * partitions) and a real cluster (leave `master` unset, size
  * `shufflePartitions` to ~2-3x total cores). Scale-relevant settings:
  *  - AQE on: runtime partition coalescing, skew-join splitting, and
  *    dynamic broadcast demotion/promotion replace hand-tuning per query;
  *  - skew-join handling explicitly enabled (hot keys — order ids, band
  *    buckets — get split instead of stalling a straggler);
  *  - UTC session time zone (oracle parity and sane event-time math);
  *  - nanosAsLong for the ns-precision parquet fixtures.
  */
object GraftSession {
  def build(master: Option[String], shufflePartitions: Int,
      appName: String = "graft"): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions) // graft_* functions in every session
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    master.foreach(b.master)
    b.getOrCreate()
  }

  /** Local session sized from SPARK_GRAFT_CPUS (driver contract). */
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    build(Some(s"local[$cpus]"), cpus.toInt)
  }
}
