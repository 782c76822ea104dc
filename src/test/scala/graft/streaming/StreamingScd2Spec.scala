package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming SCD2: closed-version equality against the batch operator,
  * cross-batch collapse, the late/replay drop, and restart recovery. */
class StreamingScd2Spec extends SparkSpec {
  import spark.implicits._

  private def start(ms: MemoryStream[(Long, Long, Long, String)],
      name: String, checkpoint: String) = {
    StreamingScd2.closedVersions(
      ms.toDF().toDF("key", "ts_us", "seq", "attr"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", checkpoint)
      .outputMode("append").start()
  }

  private def closed(name: String): Set[(Long, Int, Long, Long, String, Long)] =
    spark.sql(s"SELECT * FROM $name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5))).toSet

  test("closed versions equal the batch operator over the concatenated changelog") {
    implicit val sq = spark.sqlContext
    val b1 = Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (2L, 10L, 3L, "x"))
    val b2 = Seq((1L, 30L, 4L, "b"), (1L, 40L, 5L, "c"), (2L, 50L, 6L, "x"))
    val ms = MemoryStream[(Long, Long, Long, String)]
    val q = start(ms, "scd2s1", tmpDir("scd2s1"))
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      assert(closed("scd2s1").isEmpty, "nothing changed yet -> nothing closes")
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val batch = graft.operators.Extras.scd2History(
        (b1 ++ b2).toDF("key", "ts_us", "seq", "attr"))
      .filter("valid_to_us IS NOT NULL")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5))).toSet
    assert(closed("scd2s1") == batch,
      "the streaming closed set must equal the batch operator's closed rows")
  }

  test("same attribute across batches collapses; a change closes with the right count") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String)]
    val q = start(ms, "scd2s2", tmpDir("scd2s2"))
    try {
      ms.addData((7L, 10L, 1L, "v")); q.processAllAvailable()
      ms.addData((7L, 20L, 2L, "v"), (7L, 30L, 3L, "v")); q.processAllAvailable()
      assert(closed("scd2s2").isEmpty, "three equal updates stay one open version")
      ms.addData((7L, 40L, 4L, "w")); q.processAllAvailable()
    } finally q.stop()
    assert(closed("scd2s2") == Set((7L, 1, 10L, 40L, "v", 3L)),
      "the closed version collapses all three raw updates")
  }

  test("late and replayed events are absorbed, never double-counted") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String)]
    val q = start(ms, "scd2s3", tmpDir("scd2s3"))
    try {
      ms.addData((3L, 100L, 1L, "a"), (3L, 200L, 2L, "a")); q.processAllAvailable()
      // a replay of (200, 2) and a straggler at ts 150 both drop
      ms.addData((3L, 200L, 2L, "a"), (3L, 150L, 9L, "z")); q.processAllAvailable()
      ms.addData((3L, 300L, 3L, "b")); q.processAllAvailable()
    } finally q.stop()
    assert(closed("scd2s3") == Set((3L, 1, 100L, 300L, "a", 2L)),
      "n_rows stays 2 and no phantom 'z' version exists")
  }

  test("restart resumes the open version from the checkpoint") {
    // foreachBatch here: the memory sink refuses checkpoint recovery
    implicit val sq = spark.sqlContext
    val dir = tmpDir("scd2s4")
    val ms = MemoryStream[(Long, Long, Long, String)]
    val buf = scala.collection.mutable.Buffer[(Long, Int, Long, Long, String, Long)]()
    def go() = StreamingScd2.closedVersions(
        ms.toDF().toDF("key", "ts_us", "seq", "attr"))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingScd2.Scd2Closed], _: Long) =>
        b.collect().foreach(c => buf.append(
          (c.key, c.version, c.valid_from_us, c.valid_to_us, c.attr.orNull, c.n_rows)))
        ()
      }
      .option("checkpointLocation", dir).outputMode("append").start()
    val q1 = go()
    try { ms.addData((5L, 10L, 1L, "a"), (5L, 20L, 2L, "a")); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = go()
    try { ms.addData((5L, 30L, 3L, "b")); q2.processAllAvailable() }
    finally q2.stop()
    assert(buf.toSet == Set((5L, 1, 10L, 30L, "a", 2L)),
      "the pre-restart open version (2 collapsed rows) closes correctly")
  }
}
