package graft.operators

import graft.SparkSpec

/** memorization_spans: islands-by-position run folding, the span-length
  * arithmetic (run + k − 1 tokens), background zeros, the sub-k absence
  * contract and both knobs — all on hand-built train/eval corpora.
  * Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class MemorizationSpec extends SparkSpec {

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val train = df((1L, (1 to 20).map(i => s"t$i").mkString(" ")))

  test("a verbatim excerpt reads as one full-length span") {
    // eval = tokens t3..t12 of the train doc: 10 tokens, 6 windows, all
    // present -> one run of 6, longest verbatim span 6 + 5 - 1 = 10 tokens
    val ev = df((100L, (3 to 12).map(i => s"t$i").mkString(" ")))
    val r = Dedup.memorizationSpans(train, ev).collect()
    assert(r.length == 1)
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
      == ((6L, 6L, 10L, 1L)))
  }

  test("an interruption splits runs; isolated windows never reach minRun") {
    // t1..t5 | x1 | t10..t14: windows touching x1 (pos 2..6) are unmatched,
    // so matched positions are exactly {1, 7} -> two singleton runs
    val ev = df((100L,
      "t1 t2 t3 t4 t5 x1 t10 t11 t12 t13 t14"))
    val r = Dedup.memorizationSpans(train, ev).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((7L, 2L, 5L, 0L)), "max span = one window = k tokens; no run >= 3")
    // minRun is the reporting knob: at 1 both singleton runs count
    val r1 = Dedup.memorizationSpans(train, ev, minRunShingles = 1).collect()(0)
    assert(r1.getLong(4) == 2L)
  }

  test("non-adjacent matched windows never merge into one run") {
    // two excerpts separated by noise: runs of 2 and 3 windows
    val ev = df((100L,
      "t1 t2 t3 t4 t5 t6 y1 y2 t10 t11 t12 t13 t14 t15 t16"))
    // windows: 11 total; matched pos {1,2} (t1..t6 spans) and pos {9,10,11}
    val r = Dedup.memorizationSpans(train, ev).collect()(0)
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((5L, 7L, 1L)),
      "runs of 2 and 3: only the 3-run reports; max span 3 + 4 = 7 tokens")
  }

  test("zero-overlap docs report a zeros row; sub-k docs are absent") {
    val ev = df((100L, "z1 z2 z3 z4 z5"), (101L, "z1 z2 z3 z4"))
    val r = Dedup.memorizationSpans(train, ev).collect()
    assert(r.length == 1 && r(0).getLong(0) == 100L,
      "4-token doc has no 5-window: absent by contract")
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
      == ((1L, 0L, 0L, 0L)))
  }

  test("k is the identity width: shorter windows surface shorter overlaps") {
    // 3-token overlap invisible at k=5, one window at k=3
    val ev = df((100L, "t5 t6 t7 q1 q2"))
    assert(Dedup.memorizationSpans(train, ev).collect()(0).getLong(2) == 0L)
    val r3 = Dedup.memorizationSpans(train, ev, k = 3, minRunShingles = 1).collect()(0)
    assert((r3.getLong(2), r3.getLong(3), r3.getLong(4)) == ((1L, 3L, 1L)))
  }

  test("guards are loud") {
    intercept[IllegalArgumentException](
      Dedup.memorizationSpans(train, df((1L, "a b c")), k = 1))
    intercept[IllegalArgumentException](
      Dedup.memorizationSpans(train, df((1L, "a b c")), minRunShingles = 0))
  }
}
