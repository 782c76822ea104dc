package graft.sources

import org.apache.spark.sql.SparkSession

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Small-files compaction for append-mode parquet logs.
  *
  * Every micro-batch append (`LogPipeline.run`, `StreamingCuration`,
  * `CdcRouter.processBatch`) adds a handful of files per trigger; at a
  * 5 s cadence that is ~17 k files/day/sink — the classic small-files
  * problem that makes a 100 TB table unreadable (NameNode pressure, task
  * per tiny split, footer-read storms). Compaction rewrites a closed
  * partition (yesterday's date dir, a finished topic dir) into
  * size-targeted files, preserving every row.
  *
  * Mechanics: read the dir, `repartition(ceil(bytes / targetBytes))`,
  * write to a scratch dir, then swap via two renames (dir → .bak,
  * scratch → dir) and delete the backup. On a single filesystem the
  * renames are atomic individually but the SWAP is not — a reader racing
  * the swap can see the dir missing. That is the accepted contract for
  * compacting CLOSED partitions (nothing writes them, readers resolve
  * partitions at query start); table formats with a transaction log
  * (Delta/Iceberg, out of scope here) are the general answer for hot
  * partitions.
  */
object Compaction {

  /** Bytes of parquet data files directly inside `dir`. */
  private def dataBytes(dir: File): Long =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.length()).sum

  private def dataFileCount(dir: File): Int =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .count(f => f.isFile && f.getName.endsWith(".parquet"))

  /** Compact one partition directory in place. Returns (filesBefore,
    * filesAfter). No-op (and no rewrite) if the dir already has at most
    * the target file count. */
  def compactPartition(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val d = new File(dir)
    require(d.isDirectory, s"not a directory: $dir")
    val before = dataFileCount(d)
    val n = math.max(1, math.ceil(dataBytes(d).toDouble / targetBytes).toInt)
    if (before <= n) return (before, before)
    // read fully BEFORE touching the dir; repartition (round-robin) spreads
    // rows evenly across the target files regardless of input skew
    val df = spark.read.parquet(dir).repartition(n)
    val scratch = dir.stripSuffix("/") + ".compact-tmp"
    val bak = dir.stripSuffix("/") + ".compact-bak"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(scratch))
    org.apache.commons.io.FileUtils.deleteQuietly(new File(bak))
    df.write.mode("overwrite").parquet(scratch)
    Files.move(Paths.get(dir), Paths.get(bak), StandardCopyOption.ATOMIC_MOVE)
    try Files.move(Paths.get(scratch), Paths.get(dir), StandardCopyOption.ATOMIC_MOVE)
    catch { case e: Throwable =>
      // restore the original so a failed swap never loses the partition
      Files.move(Paths.get(bak), Paths.get(dir), StandardCopyOption.ATOMIC_MOVE)
      throw e
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new File(bak))
    (before, dataFileCount(new File(dir)))
  }
}
