package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure kernels of the round-2 operators: the
  * bounded TopK aggregator (vs sort-take-k, under arbitrary partition
  * splits and merge orders) and the text-stats scan (vs the regex
  * reference semantics the DuckDB oracle uses). */
object OperatorProperties extends Properties("graft.operators") {

  private val scored: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(-10.0, 10.0), Gen.chooseNum(0L, 30L)))
      .map(_.distinctBy(_._2)) // unique ids, like vec_id per query group

  private val k: Gen[Int] = Gen.chooseNum(1, 6)

  private def reference(vals: List[(Double, Long)], k: Int): Seq[(Double, Long)] =
    vals.sortBy { case (s, id) => (-s, id) }.take(k)

  property("TopK.reduce == sort-take-k") = forAll(scored, k) { (vals, k) =>
    val agg = new TopK(k)
    vals.foldLeft(agg.zero)(agg.reduce) == reference(vals, k)
  }

  property("TopK merge is split-invariant (any partitioning of the input)") =
    forAll(scored, k, Gen.chooseNum(0, 100)) { (vals, k, cut) =>
      val agg = new TopK(k)
      val at = if (vals.isEmpty) 0 else cut % (vals.size + 1)
      val (l, r) = vals.splitAt(at)
      val lb = l.foldLeft(agg.zero)(agg.reduce)
      val rb = r.foldLeft(agg.zero)(agg.reduce)
      agg.merge(lb, rb) == reference(vals, k) &&
        agg.merge(rb, lb) == reference(vals, k) // merge order irrelevant
    }

  private val text: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.numChar, 3 -> Gen.const(' '),
      2 -> Gen.oneOf('!', ',', '.', 'X', '9'))).map(_.mkString)

  property("textStats matches regex reference semantics") = forAll(text) { s =>
    val row = HashExpressions.evalTextStats(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    val toks = "[a-z0-9]+".r.findAllIn(s.toLowerCase).toList
    row.getInt(0) == toks.length &&
      row.getInt(1) == toks.distinct.length &&
      row.getInt(2) == toks.count(Stopwords.lists("en").contains) &&
      row.getLong(6) == toks.map(_.length.toLong).sum &&
      row.getInt(7) == s.count(c => !(c.isDigit || (c >= 'a' && c <= 'z') || c == ' '))
  }

  property("srp12 signs match the double-accumulate reference") =
    forAll(Gen.listOfN(64, Gen.chooseNum(-1.0f, 1.0f))) { emb =>
      val data = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        emb.map(f => f: Any).toArray)
      val out = HashExpressions.evalSrp12(data)
      (0 until 12).forall { j =>
        var acc = 0.0
        for (i <- 1 to 64)
          acc += emb(i - 1).toDouble * (((i * 1103 + j * 907) % 2001 - 1000).toDouble / 1000.0)
        out.getInt(j) == (if (acc >= 0) 1 else 0)
      }
    }

  // the driver json.load's every Verify/Bench output line; the escaper must
  // never emit a raw control char, quote, or lone backslash
  property("Json.escape output is a safe JSON string body for any input") =
    forAll(Gen.listOf(Gen.oneOf(
      Gen.asciiPrintableChar, Gen.chooseNum(0, 31).map(_.toChar),
      Gen.oneOf('"', '\\', '\n', '\r', '\t'))).map(_.mkString)) { s =>
      val e = graft.Json.escape(s)
      val noRawControl = e.forall(c => c >= ' ')
      // every quote/backslash in the output is part of an escape sequence:
      // strip the legal two-char escapes and \uXXXX forms, nothing remains
      val stripped = e.replaceAll("\\\\u[0-9a-f]{4}", "")
        .replaceAll("\\\\[\"\\\\nrt]", "")
      val noBareSpecials = !stripped.exists(c => c == '"' || c == '\\')
      noRawControl && noBareSpecials
    }
}
