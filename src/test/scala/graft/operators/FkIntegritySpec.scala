package graft.operators

import graft.SparkSpec

/** fk_integrity: orphans, null FKs and duplicate PKs each firing on
  * crafted data, the null-key join semantics, and loud guards.
  * Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class FkIntegritySpec extends SparkSpec {

  private def facts(fks: Seq[java.lang.Long]) = {
    import spark.implicits._
    fks.zipWithIndex.map { case (fk, i) => (i.toLong, fk) }.toDF("id", "fk")
  }
  private def dims(pks: Seq[java.lang.Long]) = {
    import spark.implicits._
    pks.map(p => (p, "x")).toDF("pk", "payload")
  }

  private def report(f: org.apache.spark.sql.DataFrame, d: org.apache.spark.sql.DataFrame) = {
    val r = Extras.fkIntegrity(f, "fk", d, "pk").collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getInt(6))
  }

  test("a healthy star reads all-clear") {
    val got = report(facts(Seq(1L, 2L, 1L, 3L)), dims(Seq(1L, 2L, 3L)))
    assert(got == ((4L, 0L, 0L, 0L, 3L, 3L, 1)))
  }

  test("orphans, null FKs and duplicate PKs each fire and count exactly") {
    // fk 9 points at nothing; one null fk; dim carries pk 2 twice
    val got = report(facts(Seq(1L, 9L, null, 2L)),
      dims(Seq(1L, 2L, 2L, 3L)))
    assert(got == ((4L, 1L, 1L, 250000L, 4L, 3L, 0)),
      "9 is the orphan, the null FK is counted separately, dup PK kills uniqueness")
  }

  test("a null dim key matches nothing and is not a distinct PK") {
    // fact fk 5 has no non-null partner: orphan even though dim holds NULL
    val got = report(facts(Seq(5L)), dims(Seq(null, 1L)))
    assert(got == ((1L, 0L, 1L, 1000000L, 2L, 1L, 0)),
      "n_dim 2 vs n_pk_distinct 1: the null-keyed row itself breaks uniqueness")
  }

  test("guards are loud") {
    intercept[IllegalArgumentException](
      Extras.fkIntegrity(facts(Seq(1L)), "nope", dims(Seq(1L)), "pk"))
    intercept[IllegalArgumentException](
      Extras.fkIntegrity(facts(Seq(1L)), "fk", dims(Seq(1L)), "nope"))
  }
}
