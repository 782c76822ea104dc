package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // driver contract: exactly (sfDir, outDir). A third, local-dev-only
    // arg restricts the run to a comma-separated query subset.
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, Set.empty[String])
      // trim + drop empties, same as Bench's subset contract: a space after
      // a comma would otherwise silently SKIP that query (and its oracle
      // row), reading as a pass
      case Array(a, b, f) => (a, b, f.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      case _ =>
        System.err.println("usage: graft.Verify <sfDir> <outDir> [query,query,...]")
        sys.exit(2)
    }
    // a typo'd subset name silently vanishing from the run (and from
    // oracle_sql.json) would read as a verified pass — fail loudly instead
    val unknown = only -- SparkEntry.queries.keySet
    if (unknown.nonEmpty) {
      System.err.println(
        s"[verify] unknown queries requested: ${unknown.toSeq.sorted.mkString(",")}")
      sys.exit(2)
    }
    // the ONE session factory — nanosAsLong etc. live there (events.parquet
    // stores timestamp[ns]; Tables.load converts to microsecond timestamps)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    // clear the ENTIRE out dir up front: stale parquet from a previous run
    // must never survive into this run's compare — the per-query overwrite
    // can't help when a query throws before writing, when the JVM dies
    // mid-run, or when a query was renamed (the round-2 stale-pass pitfall)
    val outFile = new java.io.File(outDir)
    if (outFile.exists()) org.apache.commons.io.FileUtils.deleteDirectory(outFile)
    outFile.mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // the startup-time outDir wipe guarantees no stale parquet exists;
        // a partial write from THIS failure is removed so the checker
        // reports "no spark output" instead of comparing fragments
        val partial = new java.io.File(s"$outDir/$name")
        try if (partial.exists())
          org.apache.commons.io.FileUtils.deleteDirectory(partial)
        catch { case c: Throwable =>
          System.err.println(s"[verify] $name partial-output cleanup failed: ${c.getMessage}")
        }
      }
      // free the query's persisted intermediates (Sorted, LSH signature
      // tables) so 70 queries in one JVM don't accumulate unbounded cache
      spark.catalog.clearCache()
    }
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${Json.str(k)}: ${Json.str(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
