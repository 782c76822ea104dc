package graft.operators

import graft.SparkSpec

/** target_encode_loo: the leave-one-out encoding pinned by hand — a row
  * never sees its own target, singleton categories fall back to the
  * global LOO mean, and a 1-row input encodes 0. Cross-engine exactness
  * is the DuckDB oracle's job at sf0.01.
  */
class TargetEncodeSpec extends SparkSpec {

  private def rows(rs: (Long, String, String)*) = {
    import spark.implicits._
    rs.toDF("id", "cat", "ys")
      .selectExpr("id", "cat", "CAST(ys AS DECIMAL(18,2)) AS y")
  }

  test("LOO excludes the row's own target; singletons use the global LOO") {
    val d = rows(
      (1L, "a", "1.00"), (2L, "a", "2.00"), (3L, "a", "3.00"),
      (4L, "b", "5.00"))
    val got = Extras.targetEncodeLoo(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) == 2.5, "(6-1)/2")
    assert(got(2L) == 2.0, "(6-2)/2")
    assert(got(3L) == 1.5, "(6-3)/2")
    assert(got(4L) == 2.0, "singleton cat b: global (11-5)/3")
  }

  test("a single-row input encodes 0 (no leave-one-out population)") {
    val d = rows((1L, "z", "7.00"))
    val r = Extras.targetEncodeLoo(d).collect()
    assert(r(0).getDouble(3) == 0.0)
  }

  test("the encoding never equals the plain category mean when targets differ") {
    val d = rows((1L, "a", "1.00"), (2L, "a", "3.00"))
    val got = Extras.targetEncodeLoo(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // plain mean = 2.0 for both; LOO = the OTHER row's value
    assert(got(1L) == 3.0 && got(2L) == 1.0)
  }
}
