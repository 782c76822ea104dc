package graft.operators

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of: latest right row at-or-before each left time, per key") {
    val left = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L), (4L, "b", 50L), (5L, "c", 9L))
      .toDF("id", "k", "t")
    val right = Seq(("a", 10L, "a@10"), ("a", 15L, "a@15"), ("b", 40L, "b@40"))
      .toDF("k", "rt", "v")
    val out = AsOf.asofBackward(left, right, "k", "t", "rt", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("v")).toMap
    assert(out == Map(
      1L -> "a@10", // equal time matches (t >= rt inclusive)
      2L -> "a@15", // latest of the two candidates
      3L -> null,   // before any right row
      4L -> "b@40",
      5L -> null))  // key with no right rows at all
  }

  test("randomized: asofBackward equals the naive per-row reference") {
    val rnd = new scala.util.Random(42) // seeded: deterministic fixture
    val left = (1 to 200).map(i =>
      (i.toLong, s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong))
    val right = (1 to 100).map(i =>
      (s"k${rnd.nextInt(10)}", rnd.nextInt(1000).toLong, i.toLong))
      .distinctBy(r => (r._1, r._2)) // unique (key, time) for determinism
    val expected = left.map { case (id, k, t) =>
      val cand = right.filter(r => r._1 == k && r._2 <= t)
      id -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
    }.toMap
    val out = AsOf.asofBackward(
        left.toDF("id", "k", "t"), right.toDF("k", "rt", "v"),
        "k", "t", "rt", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out == expected)
  }

  test("left columns and row count are preserved (left-join semantics)") {
    val left = Seq((1L, "x", 100L, "extra")).toDF("id", "k", "t", "note")
    val right = Seq(("x", 90L, 7L)).toDF("k", "rt", "payload")
    val out = AsOf.asofBackward(left, right, "k", "t", "rt", Seq("payload"))
    assert(out.columns.toSeq == Seq("id", "k", "t", "note", "payload"))
    val r = out.collect().head
    assert(r.getAs[String]("note") == "extra" && r.getAs[Long]("payload") == 7L)
  }
}
