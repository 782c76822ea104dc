package graft.operators

import graft.SparkSpec

/** text_readability + code_detect: the integer FK algebra and the code
  * signals pinned by hand on constructed texts. Cross-engine exactness
  * is the DuckDB oracle's job at sf0.01 (and the fuzz sweep's on the
  * hostile corpus).
  */
class TextSignalsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("readability replays the hand milli computation") {
    // "the cat sat. a dog ran!" -> 6 words, 2 sentences, 6 syllables
    // (every word one vowel group)
    val r = TextOps.textReadability(docs((1L, "the cat sat. a dog ran!")))
      .collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((6L, 2L, 6L)))
    // ease = 206835 - 1015*6/2 - 84600*6/6 = 206835 - 3045 - 84600
    assert(r.getLong(4) == 119190L)
    // grade = 390*6/2 + 11800*6/6 - 15590 = 1170 + 11800 - 15590
    assert(r.getLong(5) == -2620L, "trivial text reads below grade 0")
  }

  test("syllable surrogate counts vowel GROUPS with the min-1 word floor") {
    // "queueing" -> groups 'ueuei' = 1; "rhythm" -> no aeiouy... y counts:
    // 'y' in rhythm -> 1 group; "xyzzy" -> 'y','y' = 2
    val r = TextOps.textReadability(docs((1L, "queueing rhythm xyzzy strngth")))
      .collect()(0)
    // queueing=1, rhythm=1 (the y), xyzzy=2, strngth=0 -> floored 1
    assert(r.getLong(3) == 5L, s"got ${r.getLong(3)}")
    assert(r.getLong(2) == 1L, "no terminal punct -> sentence floor 1")
  }

  test("sub-word docs drop; punct runs collapse to one sentence break") {
    val got = TextOps.textReadability(docs(
      (1L, "!!! ..."), (2L, null), (3L, "words here!!! more words...")))
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(3L), "docs 1(no words)/2(null) drop")
    assert(got(0).getLong(2) == 2L, "'!!!' and '...' are ONE break each")
  }

  test("code text scores; prose doesn't; the threshold is a knob") {
    val code = "def f(x) { return x; }\n  var y = 1;\n  class Z { int q; }"
    val prose = "the quiet morning river drifted past the old stone bridge " +
      "while two herons watched from the far bank"
    val got = TextOps.codeDetect(docs((1L, code), (2L, prose))).collect()
      .map(r => r.getLong(0) -> (r.getLong(6), r.getInt(7))).toMap
    assert(got(1L)._1 > 100L && got(1L)._2 == 1, s"code scores high: ${got(1L)}")
    assert(got(2L)._1 == 0L && got(2L)._2 == 0)
    // a diluted signal: one semicolon in 500 chars of prose scores
    // (20*1000 div 500) = 40 — above the default 30, below a strict 100
    val mild = (prose + " ") * 4 + "x;"
    val loose = TextOps.codeDetect(docs((3L, mild))).collect()(0)
    val strict = TextOps.codeDetect(docs((3L, mild)), thresholdPm = 100L)
      .collect()(0)
    assert(loose.getInt(7) == 1 && strict.getInt(7) == 0,
      s"the threshold is the routing knob (score ${loose.getLong(6)})")
    intercept[IllegalArgumentException](
      TextOps.codeDetect(docs((1L, code)), thresholdPm = 1001L))
  }

  test("code signal counts replay by hand") {
    val r = TextOps.codeDetect(docs((1L, "a { b } ; ;\n  x\n\ty import")))
      .collect()(0)
    assert(r.getLong(1) == 2L, "one { one }")
    assert(r.getLong(2) == 2L)
    assert(r.getLong(3) == 1L, "'import' is the only keyword token")
    assert(r.getLong(4) == 2L, "one 2-space and one tab line start")
    // score = (30*2 + 20*2 + 40*1 + 30*2) * 1000 div max(100, 25) = 2000 -> cap
    assert(r.getLong(6) == 1000L, "the cap binds on short dense text")
  }
}
