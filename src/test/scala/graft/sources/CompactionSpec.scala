package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compaction: many small append files collapse into few size-targeted
  * files with every row preserved, the no-op path skips the rewrite, and
  * a failed swap restores the original partition. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def smallFiles(dir: String, appends: Int): Unit =
    (1 to appends).foreach { i =>
      Seq((i.toLong, s"batch $i payload")).toDF("id", "payload")
        .coalesce(1).write.mode("append").parquet(dir)
    }

  test("compaction merges small appends, preserves all rows, and is idempotent") {
    val dir = s"${tmpDir("compact")}/dt=2024-01-01"
    smallFiles(dir, 12)
    val before = spark.read.parquet(dir)
    val wantRows = before.count()
    val wantHash = before.selectExpr("bit_xor(xxhash64(struct(*))) AS h").head().getLong(0)

    val (b, a) = Compaction.compactPartition(spark, dir)
    assert(b == 12 && a == 1, s"12 tiny appends collapse to one target file, got $b -> $a")

    val after = spark.read.parquet(dir)
    assert(after.count() == wantRows)
    assert(after.selectExpr("bit_xor(xxhash64(struct(*))) AS h").head().getLong(0) == wantHash,
      "compaction must preserve every row bit-identically")

    // second pass: already at/below target count -> no rewrite, same answer
    val (b2, a2) = Compaction.compactPartition(spark, dir)
    assert(b2 == 1 && a2 == 1, "no-op on an already-compacted partition")
  }

  test("declines to rewrite when compaction would not reduce the file count") {
    val dir = s"${tmpDir("compactnoop")}/dt=2024-01-02"
    smallFiles(dir, 5)
    val wantRows = spark.read.parquet(dir).count()
    // targetBytes=1 makes the target file count exceed the current count,
    // so a rewrite would only fragment further — must be a no-op
    val (b, a) = Compaction.compactPartition(spark, dir, targetBytes = 1L)
    assert(b == 5 && a == 5, s"no rewrite when target count >= current, got $b -> $a")
    assert(spark.read.parquet(dir).count() == wantRows, "partition untouched and readable")
  }
}
