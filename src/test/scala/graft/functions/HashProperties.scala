package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests (SURVEY.md §5.4) over the pure kernels of the portable
  * hash operators — these are the exact semantics the DuckDB oracle
  * replays, so invariants here guard the cross-engine contract. */
object HashProperties extends Properties("graft.hash") {

  private val text: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.numChar, 3 -> Gen.const(' '),
      1 -> Gen.oneOf('!', ',', '.', 'X'))).map(_.mkString)

  private def th(s: String): Array[Long] =
    HashExpressions.tokenHashes(UTF8String.fromString(s))

  property("tokenHash deterministic + case-insensitive") = forAll(text) { s =>
    th(s).toSeq == th(s.toUpperCase).toSeq
  }

  property("tokenHash bounded by modulus") = forAll(text) { s =>
    th(s).forall(h => h >= 0 && h < HashExpressions.P)
  }

  property("token count == regex token count") = forAll(text) { s =>
    th(s).length == "[a-z0-9]+".r.findAllIn(s.toLowerCase).length
  }

  property("shingles distinct and bounded by n_tokens-2") = forAll(text) { s =>
    val sh = HashExpressions.shingles(th(s))
    sh.length <= math.max(th(s).length - 2, 0) &&
      sh.toSeq.distinct.length == sh.length
  }

  property("minhash: 16 lanes, monotone under shingle-superset") =
    forAll(text, text) { (s1, s2) =>
      val a = HashExpressions.shingles(th(s1))
      val b = HashExpressions.shingles(th(s2))
      val union = (a ++ b).distinct
      val sigA = HashExpressions.minhashSig(a)
      val sigU = HashExpressions.minhashSig(union)
      sigA.length == 16 && sigU.zip(sigA).forall { case (u, x) => u <= x }
    }

  property("minhash: identical shingle sets agree on every lane") =
    forAll(text) { s =>
      val a = HashExpressions.shingles(th(s))
      HashExpressions.minhashSig(a).toSeq ==
        HashExpressions.minhashSig(a.reverse).toSeq
    }

  property("simhash order-independent + 60-bit bound") = forAll(text) { s =>
    val hs = th(s)
    val f1 = HashExpressions.simhash60(hs)
    val f2 = HashExpressions.simhash60(hs.reverse)
    f1 == f2 && f1 >= 0 && f1 < (1L << 60)
  }

  property("gram5 distinct, bounded, modulus-bounded") = forAll(text) { s =>
    val g = HashExpressions.gram5Hashes(UTF8String.fromString(s))
    g.length <= math.max(s.length - 4, 0) &&
      g.forall(h => h >= 0 && h < HashExpressions.P) &&
      g.toSeq.distinct.length == g.length
  }

  property("winHashes8 distinct, bounded by n_tokens-7, modulus-bounded") =
    forAll(text) { s =>
      val w = HashExpressions.winHashes8(th(s))
      w.length <= math.max(th(s).length - 7, 0) &&
        w.forall(h => h >= 0 && h < HashExpressions.P) &&
        w.toSeq.distinct.length == w.length
    }

  property("winHashes8: shared 8-token span => shared window hash") =
    forAll(text, text) { (pre, post) =>
      // force an 8-token span and embed it in two different contexts
      val span = (1 to 8).map(i => s"w${i}x").mkString(" ")
      val d1 = s"$pre $span $post"
      val d2 = s"$post $span $pre"
      val w1 = HashExpressions.winHashes8(th(d1)).toSet
      val w2 = HashExpressions.winHashes8(th(d2)).toSet
      w1.intersect(w2).nonEmpty
    }

  property("minhash banding recall: j~0.9 superset pairs band-collide (lane decorrelation guard)") = {
    // regression guard for the Portable.LANE fix: under the old tiny lane
    // step every permutation shared one wrap point and pairs like these
    // missed ALL bands systematically. Seeded, not forAll: recall is a
    // distributional claim (theory ~99% at j ~ 0.9; biased-permutation
    // reality measured 56/60), so assert a floor over a fixed sample.
    val rnd = new scala.util.Random(7)
    def sigOf(s: String) =
      HashExpressions.evalMinhashSig(UTF8String.fromString(s)).toLongArray()
    val hits = (1 to 30).count { _ =>
      val base = Seq.fill(80)(s"w${rnd.nextInt(1000000)}").mkString(" ")
      val richer = base + " " + Seq.fill(8)(s"e${rnd.nextInt(1000000)}").mkString(" ")
      val (a, b) = (sigOf(base), sigOf(richer))
      (0 until 4).exists(band =>
        (0 until 4).forall(i => a(band * 4 + i) == b(band * 4 + i)))
    }
    Prop(hits >= 25) :| s"banding found $hits/30 near-dup pairs (floor 25)"
  }

  // exercises the supplementary-plane path: code-point positions, not
  // UTF-16 char positions (an emoji is 2 chars but ONE position)
  private val textWithAstral: Gen[String] =
    Gen.zip(text, Gen.listOf(Gen.oneOf("", "😀"))).map {
      case (s, emo) => emo.mkString + s + emo.headOption.getOrElse("")
    }

  property("cdcBounds: rolled hash == direct 16-codepoint refold at every boundary") =
    forAll(textWithAstral) { s =>
      val cps = s.codePoints().toArray
      val bounds = HashExpressions.cdcBounds(UTF8String.fromString(s)).toSet
      val direct = (16 to cps.length).filter { i =>
        var h = 0L
        var j = i - 16
        while (j < i) { h = (h * 31 + cps(j)) % HashExpressions.P; j += 1 }
        h % 64 == 0
      }.toSet
      bounds == direct
    }

  property("polyhash folds code points: an astral char is ONE term, not two surrogates") = {
    val cps = "a😀b".codePoints().toArray // a 😀 b -> [97, 128512, 98]
    val expected = cps.foldLeft(0L)((h, cp) => (h * 31 + cp) % HashExpressions.P)
    Prop(HashExpressions.evalPolyHash(UTF8String.fromString("a😀b")) == expected)
  }

  property("gram5 folds lowercased code points (É -> é, astral chars one position)") = {
    val s = "École😀x" // École😀x: 8 code points -> 4 grams
    val cps = s.codePoints().map(Character.toLowerCase).toArray
    val expected = (0 to cps.length - 5).map { i =>
      (i until i + 5).foldLeft(0L)((h, k) => (h * 31 + cps(k)) % HashExpressions.P)
    }.distinct.toSet
    Prop(HashExpressions.gram5Hashes(UTF8String.fromString(s)).toSet == expected)
  }

  property("jaccard symmetry on gram sets") = forAll(text, text) { (s1, s2) =>
    val a = HashExpressions.gram5Hashes(UTF8String.fromString(s1)).toSet
    val b = HashExpressions.gram5Hashes(UTF8String.fromString(s2)).toSet
    def j(x: Set[Long], y: Set[Long]): Double =
      if (x.isEmpty && y.isEmpty) 1.0
      else x.intersect(y).size.toDouble / x.union(y).size
    j(a, b) == j(b, a) && j(a, a) == 1.0
  }

  property("tokenizer kernels lower per code point: KELVIN SIGN joins its token as 'k'") = {
    // lower(KELVIN + 'elvin x') == 'kelvin x' on both engines; an
    // ASCII-only fold would treat the sign as a separator and tokenize
    // ['elvin', 'x']. n_punct legitimately differs (the oracle counts
    // punct on the RAW text, where the sign is non-alnum), so compare
    // the token-derived fields only.
    val kelvin = UTF8String.fromString(new String(Character.toChars(0x212A)) + "elvin x")
    val plain = UTF8String.fromString("kelvin x")
    def tokStats(s: UTF8String): (Int, Int, Long) = {
      val r = HashExpressions.evalTextStats(s)
      (r.getInt(0), r.getInt(1), r.getLong(6)) // n_tokens, n_uniq, sum_len
    }
    Prop(HashExpressions.tokenHashes(kelvin).toSeq ==
      HashExpressions.tokenHashes(plain).toSeq) &&
      Prop(tokStats(kelvin) == tokStats(plain))
  }

  // ---- sorted-merge intersection count (the dedup verify kernel): must
  // equal array_intersect's DISTINCT-count semantics on ANY inputs once
  // sorted, including duplicates — the law the oracle parity rests on ----
  private val intArr: Gen[List[Int]] =
    Gen.listOf(Gen.chooseNum(0, 40)) // small domain forces collisions + dups

  property("sortedInter == distinct set intersection (int, with duplicates)") =
    forAll(intArr, intArr) { (a, b) =>
      val got = HashExpressions.evalSortedInterInt(
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(a.sorted.toArray),
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(b.sorted.toArray))
      got == (a.toSet intersect b.toSet).size
    }

  property("sortedInter == distinct set intersection (long)") =
    forAll(Gen.listOf(Gen.chooseNum(0L, 50L)), Gen.listOf(Gen.chooseNum(0L, 50L))) { (a, b) =>
      val got = HashExpressions.evalSortedInterLong(
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(a.sorted.toArray),
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(b.sorted.toArray))
      got == (a.toSet intersect b.toSet).size
    }

  private val vec: Gen[Array[Float]] =
    Gen.listOfN(64, Gen.chooseNum(-1000, 1000).map(_ / 250.0f)).map(_.toArray)

  property("srp: width-w prefix agrees lane-for-lane with srp12; bits binary") =
    forAll(vec, Gen.chooseNum(1, 32)) { (v, w) =>
      def arr(a: Array[Float]) = org.apache.spark.sql.catalyst.expressions
        .UnsafeArrayData.fromPrimitiveArray(a)
      val wide = HashExpressions.evalSrp(arr(v), w).toIntArray()
      val demo = HashExpressions.evalSrp12(arr(v)).toIntArray()
      wide.length == w && wide.forall(b => b == 0 || b == 1) &&
        wide.take(math.min(w, 12)).toSeq == demo.take(math.min(w, 12)).toSeq
    }

  property("sortedInter symmetric + bounded by min size") =
    forAll(intArr, intArr) { (a, b) =>
      def run(x: List[Int], y: List[Int]) = HashExpressions.evalSortedInterInt(
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(x.sorted.toArray),
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(y.sorted.toArray))
      val f = run(a, b)
      f == run(b, a) && f <= math.min(a.toSet.size, b.toSet.size)
    }
}
