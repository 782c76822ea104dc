package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** SCALE.md's IVF claim, executed instead of narrated: "at 100 TB the
  * cell id is written as a partition column at index-build time →
  * probing becomes partition pruning; nprobe > 1 = an `IN` over cell
  * ids, still pruned." This spec builds exactly that layout — the
  * operator's own `assignCells` assignment written `partitionBy(cell)`
  * — and pins that a probe (a) plans partition filters, (b) physically
  * reads ONLY the probed cells' files, and (c) returns the same rows as
  * the unpartitioned filter. A regression here (a casted filter, a
  * non-atomic partition column) would silently turn 100 TB probes back
  * into full scans while every row-level test stayed green. */
class IvfPartitionSpec extends SparkSpec {

  test("ivf probe over cell-partitioned parquet prunes to the probed cells' files") {
    val dir = tmpDir("ivfpart")
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val assigned = Similarity.assignCells(emb, 4).select("vec_id", "cell")
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
    assigned.write.partitionBy("cell").parquet(s"$dir/ivf")

    val index = spark.read.parquet(s"$dir/ivf")
    val nprobe = index.filter(col("cell").isin(0, 2))
    // (c) correctness first: pruning must not change the answer
    val expected = assigned.filter(col("cell").isin(0, 2)).count()
    assert(nprobe.count() == expected && expected > 0,
      "the probed subset must match the unpartitioned filter")

    val scans = nprobe.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a parquet file scan")
    // (a) the IN lands in PartitionFilters (metadata-only), not in
    // PushedFilters (row-group) or a post-scan Filter (row-at-a-time)
    val meta = scans.head.metadata
    assert(meta("PartitionFilters").contains("cell"),
      s"cell IN (...) must prune at the partition index: ${meta("PartitionFilters")}")
    // (b) and the pruning is physical: only the 2 probed directories of
    // the 4 cell partitions are read
    val parts = scans.head.selectedPartitions.partitionCount
    assert(parts == 2,
      s"expected 2 of 4 cell partitions after pruning, scanned $parts")
  }
}
