package graft.operators

import graft.SparkSpec

/** zorder_layout: the Morton interleave algebra and the clustering claim
  * pinned by hand — on a full 16×16 grid, every z-bucket is a bounded
  * 4×4 tile while every linear bucket leaves dim-y at full span. That
  * span delta is the file-skipping win the operator exists to report.
  * Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class ZorderSpec extends SparkSpec {

  private def z(x: Long, y: Long): Long =
    spark.sql(s"SELECT ${Curation.zInterleaveSpark(s"CAST($x AS BIGINT)", s"CAST($y AS BIGINT)")} AS z")
      .collect()(0).getLong(0)

  test("bit interleave: x bits land at even positions, y bits at odd") {
    assert(z(3, 0) == 5, "0b11 -> 0b0101")
    assert(z(0, 3) == 10, "0b11 -> 0b1010")
    assert(z(3, 3) == 15)
    assert(z(0xFFFFL, 0) == 0x55555555L, "a full 16-bit x fills every even bit")
    assert(z(0, 0xFFFFL) == 0xAAAAAAAAL.toLong)
    assert(z(0x10000L, 0) == 0, "bit 16 is masked: the 16-bit contract is explicit")
  }

  test("on a 16x16 grid, z-buckets are 4x4 tiles; linear buckets leave y unbounded") {
    import spark.implicits._
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val rows = Curation.zorderLayout(grid, buckets = 16).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4) - r.getLong(3), r.getLong(6) - r.getLong(5)))
    val zb = rows.filter(_._1 == "zorder")
    val lb = rows.filter(_._1 == "linear")
    assert(zb.length == 16 && lb.length == 16)
    assert(zb.forall { case (_, _, n, sx, sy) => n == 16 && sx == 3 && sy == 3 },
      s"every z-bucket must be a full 4x4 Morton tile, got ${zb.mkString(";")}")
    assert(lb.forall { case (_, _, n, sx, sy) => n == 16 && sx == 0 && sy == 15 },
      "every linear bucket is one x-column: dim-y spans the whole domain")
  }

  test("a bad bucket count is loud") {
    import spark.implicits._
    val d = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException](Curation.zorderLayout(d, buckets = 0))
    intercept[IllegalArgumentException](Curation.zorderLayout(d, buckets = -4))
  }

  test("a single-point frame is one bucket per layout with point extents") {
    import spark.implicits._
    val rows = Curation.zorderLayout(Seq((7L, 9L)).toDF("x", "y")).collect()
    assert(rows.length == 2, "one bucket per layout")
    // the sole value IS the max, so it maps to the top of the occupied
    // range: (v*B) div (v+1) — deterministic in both engines
    assert(rows.forall { r =>
      r.getLong(2) == 1L && r.getLong(3) == 7L && r.getLong(4) == 7L &&
        r.getLong(5) == 9L && r.getLong(6) == 9L
    })
  }
}
