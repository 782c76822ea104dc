package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe for the streaming layer's scale story: drives
  * `StreamingCuration` (watermark-bounded RocksDB dedup state) and
  * `StreamingHeavyHitters` (constant-size driver sketch) over a FILE
  * spool built from a documents corpus, one spool file per micro-batch,
  * and prints per-batch rows, trigger/addBatch/commit durations, and the
  * state-store metrics (`numRowsTotal`, memory used, RocksDB SST bytes)
  * from the query progress — the measurements behind SCALE.md's
  * streaming section. The spool stamps each file with a +60 s event-time
  * step so a 1-hour watermark horizon retains every batch's state: the
  * ADVERSARIAL shape for the state store (nothing evicts, the salted
  * corpus makes every digest distinct), which is exactly what a
  * state-size measurement should saturate.
  *
  * Usage: StreamingProbe <docsDir> <workDir> [nFiles]
  */
object StreamingProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.tools.StreamingProbe <docsDir> <workDir> [nFiles]")
      sys.exit(2)
    }
    val srcDir = args(0)
    val workDir = args(1)
    val nFiles = args.lift(2).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-streamprobe")
    spark.sparkContext.setLogLevel("ERROR")

    // ---- build the spool: nFiles single-file parquet slices, one per
    // micro-batch (maxFilesPerTrigger=1), event time stepping +60 s per
    // file so the 1 h horizon holds ~all state by the last batch
    val spool = new java.io.File(workDir, "spool")
    spool.mkdirs()
    val docs = graft.Tables.load(spark, srcDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    for (i <- 0 until nFiles) {
      val tmp = new java.io.File(workDir, s"tmp$i")
      docs.filter(col("doc_id") % nFiles === i)
        .withColumn("ts", expr(s"timestamp_seconds(1704067200 + $i * 60)"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(spool, f"f$i%04d.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
    val schema = docs.withColumn("ts", expr("timestamp_seconds(0)")).schema

    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(spool.getAbsolutePath)

    // ---- StreamingCuration under RocksDB: per-batch state metrics
    val cur = graft.streaming.StreamingCuration.run(
      spark, stream(), s"$workDir/cur")
    cur.processAllAvailable()
    val prog = cur.recentProgress.toSeq
    cur.stop()
    println("== StreamingCuration (RocksDB keyed dedup state) ==")
    prog.filter(_.numInputRows > 0).foreach { p =>
      val so = p.stateOperators.headOption
      val rocks = so.map(_.customMetrics)
      def cm(k: String): Long =
        rocks.flatMap(m => Option(m.get(k))).map(_.longValue).getOrElse(-1L)
      println(s"batch=${p.batchId} rows=${p.numInputRows}" +
        s" trigger_ms=${p.durationMs.get("triggerExecution")}" +
        s" addBatch_ms=${p.durationMs.get("addBatch")}" +
        s" commit_ms=${Option(p.durationMs.get("commitOffsets")).getOrElse(-1L)}" +
        s" state_rows=${so.map(_.numRowsTotal).getOrElse(-1L)}" +
        s" state_mem=${so.map(_.memoryUsedBytes).getOrElse(-1L)}" +
        s" sst_bytes=${cm("rocksdbSstFileSize")}" +
        s" commit_state_ms=${so.map(_.commitTimeMs).getOrElse(-1L)}")
    }

    // ---- StreamingHeavyHitters: constant-size driver sketch, per-batch wall
    val tracker = new graft.streaming.StreamingHeavyHitters.Tracker(
      Some(s"$workDir/hh_state"))
    val hh = graft.streaming.StreamingHeavyHitters.start(
      stream(), tracker, s"$workDir/hh_chk")
    hh.processAllAvailable()
    val hhProg = hh.recentProgress.toSeq
    hh.stop()
    println("== StreamingHeavyHitters (constant CMS state) ==")
    hhProg.filter(_.numInputRows > 0).foreach { p =>
      println(s"batch=${p.batchId} rows=${p.numInputRows}" +
        s" trigger_ms=${p.durationMs.get("triggerExecution")}" +
        s" addBatch_ms=${p.durationMs.get("addBatch")}")
    }
    println(s"sketch_bytes=${tracker.sketch.length * 8} (constant across batches)" +
      s" total_tokens=${tracker.totalTokens}")

    // ---- StreamingNearDup: band-bucket keyed state (capped + TTL'd).
    // The salted corpus is the adversarial shape here too: every doc has
    // ~K near-identical siblings, so buckets fill toward the cap and the
    // pair stream grows ~K² per source doc — the streaming twin of the
    // batch dedup family's saturated-decade probes. The 1 h TTL with the
    // +60 s/file step retains every bucket (no eviction), maximizing
    // state. Output drains to a noop sink; emitted-pair count comes from
    // the progress rows.
    val nd = graft.streaming.StreamingNearDup.pairs(
        stream(), ttlMs = 60L * 60 * 1000)
      .writeStream.format("noop")
      .option("checkpointLocation", s"$workDir/nd_chk")
      .outputMode("append").start()
    nd.processAllAvailable()
    val ndProg = nd.recentProgress.toSeq
    nd.stop()
    println("== StreamingNearDup (capped band-bucket keyed state) ==")
    ndProg.filter(_.numInputRows > 0).foreach { p =>
      val so = p.stateOperators.headOption
      println(s"batch=${p.batchId} rows=${p.numInputRows}" +
        s" pairs_out=${p.sink.numOutputRows}" +
        s" trigger_ms=${p.durationMs.get("triggerExecution")}" +
        s" addBatch_ms=${p.durationMs.get("addBatch")}" +
        s" state_rows=${so.map(_.numRowsTotal).getOrElse(-1L)}" +
        s" state_mem=${so.map(_.memoryUsedBytes).getOrElse(-1L)}" +
        s" commit_state_ms=${so.map(_.commitTimeMs).getOrElse(-1L)}")
    }
    // ---- StreamingEmbeddingNearDup: the embedding twin's state story.
    // On the SALTED corpus the perturbed copies are ~1.0-cosine
    // near-dups of their source, so (like the text probe above) buckets
    // fill toward the cap and the pair stream saturates toward K² per
    // source vector; on the ROTATED corpus copies are decorrelated and
    // the probe measures pure bucket-state cost. Width 8 = the
    // production occupancy default. Same 1 h TTL / +60 s step: nothing
    // evicts, state is maximal by the last batch.
    val espool = new java.io.File(workDir, "espool")
    espool.mkdirs()
    val vecs = graft.Tables.load(spark, srcDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    for (i <- 0 until nFiles) {
      val tmp = new java.io.File(workDir, s"etmp$i")
      vecs.filter(col("vec_id") % nFiles === i)
        .withColumn("ts", expr(s"timestamp_seconds(1704067200 + $i * 60)"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(espool, f"f$i%04d.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
    val eschema = vecs.withColumn("ts", expr("timestamp_seconds(0)")).schema
    val end = graft.streaming.StreamingEmbeddingNearDup.pairs(
        spark.readStream.schema(eschema).option("maxFilesPerTrigger", "1")
          .parquet(espool.getAbsolutePath),
        ttlMs = 60L * 60 * 1000)
      .writeStream.format("noop")
      .option("checkpointLocation", s"$workDir/end_chk")
      .outputMode("append").start()
    end.processAllAvailable()
    val endProg = end.recentProgress.toSeq
    end.stop()
    println("== StreamingEmbeddingNearDup (SRP band-bucket keyed state) ==")
    endProg.filter(_.numInputRows > 0).foreach { p =>
      val so = p.stateOperators.headOption
      println(s"batch=${p.batchId} rows=${p.numInputRows}" +
        s" pairs_out=${p.sink.numOutputRows}" +
        s" trigger_ms=${p.durationMs.get("triggerExecution")}" +
        s" addBatch_ms=${p.durationMs.get("addBatch")}" +
        s" state_rows=${so.map(_.numRowsTotal).getOrElse(-1L)}" +
        s" state_mem=${so.map(_.memoryUsedBytes).getOrElse(-1L)}" +
        s" commit_state_ms=${so.map(_.commitTimeMs).getOrElse(-1L)}")
    }

    // ---- StreamingConversionLatency: per-user funnel state + the
    // driver-held HDR histogram. The spool slices the REAL event stream
    // by event time (watermark-ordered batches, the production shape);
    // per-user state should level off at the in-flight-user domain and
    // the histogram at the ~1.9k-bucket bound while conversions
    // accumulate monotonically across batches.
    val cspool = new java.io.File(workDir, "cspool")
    cspool.mkdirs()
    val ev = graft.Tables.load(spark, srcDir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .selectExpr("user_id", "ts", "event_id AS seq", "event_type")
    val tr = ev.agg(min(expr("unix_millis(ts)")), max(expr("unix_millis(ts)"))).head()
    val (tmin, tmax) = (tr.getLong(0), tr.getLong(1))
    val width = math.max(1L, (tmax - tmin) / nFiles + 1)
    for (i <- 0 until nFiles) {
      val tmp = new java.io.File(workDir, s"ctmp$i")
      ev.filter(expr(s"(unix_millis(ts) - ${tmin}L) div ${width}L = $i"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(cspool, f"f$i%04d.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
    val robuf = scala.collection.mutable.Buffer[
      graft.streaming.StreamingConversionLatency.Readout]()
    val conv = graft.streaming.StreamingConversionLatency.run(
      spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1")
        .parquet(cspool.getAbsolutePath),
      s"$workDir/conv_chk", Some(s"$workDir/conv_state"),
      onReadout = robuf.append(_))
    conv.processAllAvailable()
    val cProg = conv.recentProgress.toSeq
    conv.stop()
    println("== StreamingConversionLatency (per-user funnel state + driver HDR) ==")
    cProg.filter(_.numInputRows > 0).foreach { p =>
      val so = p.stateOperators.headOption
      println(s"batch=${p.batchId} rows=${p.numInputRows}" +
        s" trigger_ms=${p.durationMs.get("triggerExecution")}" +
        s" addBatch_ms=${p.durationMs.get("addBatch")}" +
        s" state_rows=${so.map(_.numRowsTotal).getOrElse(-1L)}" +
        s" state_mem=${so.map(_.memoryUsedBytes).getOrElse(-1L)}" +
        s" commit_state_ms=${so.map(_.commitTimeMs).getOrElse(-1L)}")
    }
    robuf.lastOption.foreach(r =>
      println(s"final: converters=${r.n} hist_buckets=${r.histBuckets}" +
        s" quantiles=${r.quantiles.mkString(",")}"))
    spark.stop()
  }
}
