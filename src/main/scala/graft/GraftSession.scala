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
      // let AQE re-optimize CACHED plans too (off by default for
      // output-partitioning compatibility only — SPARK-35332). The engine
      // persists many intermediates (Sorted results, LSH signature tables,
      // token-frequency frames); without this every `persist` materializes
      // with the static shuffle-partition count and NO partition
      // coalescing, so a KB-sized cached frame carries
      // `spark.sql.shuffle.partitions` near-empty blocks and every
      // downstream stage over it schedules that many near-empty tasks
      // (measured round 16: 23 such 32-task stages per pretrain_prep run
      // at sf0.1, 40-370 ms each of pure scheduling). At cluster scale the
      // same flag sizes cached-plan partitions by AQE's advisory bytes
      // instead of a static constant — strictly more scale-adaptive.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // RocksDB-backed keyed state for every streaming query: the default
      // HDFSBackedStateStoreProvider keeps ALL keys on the executor heap,
      // which at the reference's per-device cardinality (UniqueVisitApp's
      // per-mid dedup state — billions of keys at 100 TB) is an executor
      // OOM, not a tuning problem. RocksDB holds state off-heap with
      // incremental (changelog) checkpoints; heap usage becomes bounded
      // block-cache + memtable instead of O(keys). The streaming suites
      // run under this same provider (SparkSpec sets it identically).
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
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
