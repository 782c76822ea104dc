package graft

/** The bench/verify harnesses run all ~70 queries in one JVM; queries that
  * persist intermediates (Sorted's presentation-sort cache, the LSH
  * signature tables) must be releasable between queries or cache + GC
  * pressure accumulates across the run (round-2 driver bench inflated the
  * back half 6-21x). These tests pin the contract the harness relies on:
  * `spark.catalog.clearCache()` returns the block manager to empty.
  */
class CacheHygieneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def cachedRddCount: Int = spark.sparkContext.getPersistentRDDs.size

  /** Suites share one forked-JVM session, and earlier suites' eager
    * localCheckpoints (the graph/curation golden specs) live OUTSIDE the
    * CacheManager — clearCache cannot touch them and only the
    * ContextCleaner frees them once GC'd. Drain with the same bounded
    * poll the second test uses, so this suite asserts its OWN hygiene,
    * not its predecessors' GC timing. */
  private def drainToZero(): Unit = {
    spark.catalog.clearCache()
    val deadline = System.nanoTime() + 15_000_000_000L
    while (cachedRddCount > 0 && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(200)
    }
  }

  test("clearCache frees every persist a query leaves behind (bench/verify contract)") {
    drainToZero()
    assert(cachedRddCount == 0, s"stragglers survived the drain: $cachedRddCount")
    // dedup_minhash persists both its signature table and Sorted's result
    SparkEntry.queries("dedup_minhash")(spark, dir).collect()
    assert(cachedRddCount > 0, "expected the query to register persisted plans")
    spark.catalog.clearCache()
    assert(cachedRddCount == 0,
      s"block manager should be empty after clearCache, found $cachedRddCount cached RDDs")
  }

  test("connectedComponents leaves no CacheManager entries (localCheckpoint blocks are GC-reclaimed)") {
    spark.catalog.clearCache()
    drainToZero()
    SparkEntry.queries("dedup_clusters")(spark, dir).collect()
    spark.catalog.clearCache()
    // localCheckpoint blocks live outside the CacheManager and are freed by
    // the ContextCleaner once unreferenced — asynchronously, so poll with a
    // bound instead of a single fixed sleep (this box is noisy)
    val deadline = System.nanoTime() + 15_000_000_000L
    while (cachedRddCount > 0 && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(200)
    }
    assert(cachedRddCount == 0,
      s"expected no persistent RDDs after clearCache+GC, found $cachedRddCount")
  }

  test("connectedComponents plan depth stays constant across iterations (lineage truncation)") {
    import org.apache.spark.sql.functions._
    val sess = spark
    import sess.implicits._
    // a path graph 0-1-2-...-9: diameter forces several propagation rounds
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = operators.Curation.connectedComponents(pairs, maxIters = 25)
    // the result plan hangs off a LogicalRDD (checkpointed last round), not
    // a 9-deep union/join tower
    val planStr = out.queryExecution.optimizedPlan.toString
    assert(planStr.contains("LogicalRDD") || planStr.contains("ExistingRDD"),
      s"expected lineage-truncated scan at the leaves, got:\n$planStr")
    assert(!planStr.contains("Union"), "per-iteration unions must not survive into the final plan")
    val rows = out.collect()
    assert(rows.length == 10 && rows.forall(r => r.getLong(1) == 0L && r.getLong(2) == 10L),
      "one component labeled 0 with size 10")
  }
}
