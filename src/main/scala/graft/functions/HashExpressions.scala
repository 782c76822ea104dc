package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Native Catalyst expressions for the portable-hash operators.
  *
  * Semantics are bit-identical to the SQL higher-order-function forms in
  * [[Portable]] (and therefore to the DuckDB oracles): lowercase, tokenize
  * on non-[a-z0-9], polynomial char hash base 31 mod P, 3-token shingles,
  * 16 affine-permutation minhashes mod P61, 60-bit token-vote simhash,
  * rolling char 5-grams. The win over the lambda forms is a single tight
  * JVM loop per row instead of millions of interpreted expression nodes —
  * at 100 TB these run map-side inside the scan stage.
  *
  * All expressions implement `doGenCode`, so they stay INSIDE whole-stage
  * codegen (no CodegenFallback row boxing on the dedup hot path): the
  * generated code is a single static-style call into the same tight loops
  * `eval` uses, and array results are `UnsafeArrayData` (no per-element
  * boxing on either path).
  */
object HashExpressions {
  final val P: Long = Portable.P
  final val P61: Long = Portable.P61
  final val MIX: Long = Portable.MIX

  /** Lowercase (ASCII) + tokenize on non-[a-z0-9] + per-token poly hash. */
  private[functions] def tokenHashes(s: UTF8String): Array[Long] = {
    val str = s.toString
    val out = mutable.ArrayBuilder.make[Long]
    var h = 0L
    var inTok = false
    var i = 0
    val n = str.length
    while (i < n) {
      // CODE POINTS + Unicode simple lowercase, then the ASCII token
      // class — the oracle tokenizes lower(text), and a few non-ASCII
      // code points lower into [a-z] (U+212A KELVIN SIGN -> 'k'); an
      // ASCII-only fold would split tokens the oracle keeps intact
      // (review find). Anything still >= 128 after lowering separates
      // on both engines ([^a-z0-9] covers it).
      val cp = str.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      val alnum = (lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')
      if (alnum) {
        h = (h * 31 + lc) % P
        inTok = true
      } else if (inTok) {
        out += h; h = 0L; inTok = false
      }
      i += Character.charCount(cp)
    }
    if (inTok) out += h
    out.result()
  }

  private[functions] def shingles(th: Array[Long]): Array[Long] = {
    if (th.length < 3) return Array.emptyLongArray
    val seen = new mutable.LinkedHashSet[Long]
    var i = 0
    while (i < th.length - 2) {
      seen += ((th(i) * 31 + th(i + 1)) % P * 31 + th(i + 2)) % P
      i += 1
    }
    seen.toArray
  }

  /** Distinct rolling 8-token window hashes — the exact-substring dedup
    * unit (a shared window hash ⇒ the two docs share an identical 8-token
    * span, modulo hash collision at ~1/P). Same fold as [[shingles]] but
    * width 8 and non-overlap-collapsed via LinkedHashSet. */
  private[functions] def winHashes8(th: Array[Long]): Array[Long] = {
    if (th.length < 8) return Array.emptyLongArray
    val seen = new mutable.LinkedHashSet[Long]
    var i = 0
    while (i <= th.length - 8) {
      var h = 0L
      var k = 0
      while (k < 8) {
        h = (h * 31 + th(i + k)) % P
        k += 1
      }
      seen += h
      i += 1
    }
    seen.toArray
  }

  /** Content-defined chunk boundary positions: 1-based char indices i
    * (i >= 16) where the polynomial hash of chars [i-15 .. i] (base 31
    * mod P) ≡ 0 (mod 64). Rabin-Karp incremental update — one multiply,
    * one subtract, one add per char instead of a 16-step refold; modular
    * arithmetic makes the rolled value IDENTICAL to the direct fold the
    * DuckDB oracle computes. */
  private[functions] def cdcBounds(s: UTF8String): Array[Int] = {
    val str = s.toString
    // positions and hash units are CODE POINTS, not UTF-16 chars: the
    // consumers (Spark SQL substring/length and DuckDB substr/ascii) both
    // index code points, so char-unit positions would misalign every
    // chunk after the first supplementary-plane character (review find)
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n < 16) return Array.emptyIntArray
    // 31^15 mod P, for removing the outgoing code point
    var pow = 1L
    var k = 0
    while (k < 15) { pow = pow * 31 % P; k += 1 }
    val out = mutable.ArrayBuilder.make[Int]
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * 31 + cps(i)) % P
      if (i >= 16) {
        // remove code point i-16 (weight 31^15 after the incoming shift)
        h = (h - cps(i - 16).toLong * pow % P * 31 % P + P * 31) % P
      }
      if (i >= 15 && h % 64 == 0) out += i + 1
      i += 1
    }
    out.result()
  }

  private[functions] def minhashSig(sh: Array[Long]): Array[Long] = {
    val sig = new Array[Long](16)
    var j = 0
    while (j < 16) {
      val a = MIX + Portable.LANE * j
      val b = 98765432L + 1234577L * j
      var best = Long.MaxValue
      var i = 0
      while (i < sh.length) {
        val v = (sh(i) * a + b) % P61
        if (v < best) best = v
        i += 1
      }
      sig(j) = best
      j += 1
    }
    sig
  }

  private[functions] def simhash60(th: Array[Long]): Long = {
    val votes = new Array[Int](60)
    var i = 0
    while (i < th.length) {
      val g = (th(i) * MIX) % P61
      var b = 0
      while (b < 60) {
        if (((g >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Distinct rolling char-5-gram hashes of the lowercased string.
    * CODE POINTS, not UTF-16 units, and Unicode simple lowercase — the
    * dedup_ngram_jaccard oracle walks ascii(substr(lower(text), i, 1)),
    * i.e. one code point per position with DuckDB's lower() (review
    * find: the old ASCII-only fold left 'É' unfolded and split astral
    * chars into two surrogates). Full case folding (e.g. U+0130 mapping
    * to two code points) stays out of contract on both engines. */
  private[functions] def gram5Hashes(s: UTF8String): Array[Long] = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n < 5) return Array.emptyLongArray
    val codes = new Array[Long](n)
    var i = 0
    while (i < n) {
      codes(i) = Character.toLowerCase(cps(i)).toLong
      i += 1
    }
    val seen = new mutable.LinkedHashSet[Long]
    i = 0
    while (i <= n - 5) {
      var h = 0L
      var k = 0
      while (k < 5) {
        h = (h * 31 + codes(i + k)) % P
        k += 1
      }
      seen += h
      i += 1
    }
    seen.toArray
  }

  // ---- codegen entry points: one call per row from the generated code,
  // returning unsafe (unboxed) arrays. Referenced from doGenCode as
  // `graft.functions.HashExpressions$.MODULE$.<name>(...)`. -----------------
  def evalTokenHashes(s: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(tokenHashes(s))
  def evalShingles(s: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(shingles(tokenHashes(s)))
  def evalMinhashSig(s: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(minhashSig(shingles(tokenHashes(s))))
  def evalSimhash(s: UTF8String): Long = simhash60(tokenHashes(s))
  def evalGram5(s: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(gram5Hashes(s))
  def evalWinHash8(s: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(winHashes8(tokenHashes(s)))
  def evalCdcBounds(s: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(cdcBounds(s))
  def evalCosine(l: ArrayData, r: ArrayData): Double = {
    val a = l.toFloatArray()
    val b = r.toFloatArray()
    // mismatched dimensionality is malformed input: return NaN (filtered by
    // every >= threshold and skipped by TopK) rather than silently computing
    // a plausible-but-wrong cosine over the common prefix
    if (a.length != b.length) return Double.NaN
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      dot += (a(i) * b(i)).toDouble // float multiply, double accumulate
      na += (a(i) * a(i)).toDouble
      nb += (b(i) * b(i)).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Raw-character polynomial hash (base 31 mod P) over the UNlowered
    * string — the whole-document fingerprint arithmetic. */
  def evalPolyHash(s: UTF8String): Long = {
    // CODE POINTS (the oracle folds ascii(substr(text, i, 1)) — one code
    // point per position); UTF-16 units would hash an astral char as two
    // surrogates and break fingerprint parity (review find)
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Single-pass text statistics: token count, distinct-token count, one
    * stopword hit count per [[Stopwords.scored]] language, summed token
    * length, and the punctuation count (chars outside [a-z0-9 ] in the RAW
    * string — uppercase counts, matching
    * `length(regexp_replace(text, '[a-z0-9 ]', ''))`). Tokenization is the
    * shared lower+split-on-non-[a-z0-9] contract. One scan replaces ~8
    * interpreted higher-order-lambda passes in the SQL form. */
  def evalTextStats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    var nTokens = 0
    var sumLen = 0L
    var nPunct = 0
    val uniq = new java.util.HashSet[String]()
    val stopCounts = new Array[Int](Stopwords.sets.length)
    val sb = new java.lang.StringBuilder
    def flush(): Unit = if (sb.length > 0) {
      val t = sb.toString
      nTokens += 1
      sumLen += t.length
      uniq.add(t)
      var j = 0
      while (j < stopCounts.length) {
        if (Stopwords.sets(j).contains(t)) stopCounts(j) += 1
        j += 1
      }
      sb.setLength(0)
    }
    var i = 0
    while (i < str.length) {
      // advance by CODE POINT: the n_punct oracle is length() of a
      // regexp_replace'd string, which counts code points — an astral
      // char must count once, not twice (review find)
      val cp = str.codePointAt(i)
      // Unicode simple lowercase FIRST, then the ASCII token class: the
      // oracle tokenizes lower(text), and a few non-ASCII code points
      // lower into [a-z] (U+212A KELVIN SIGN -> 'k') — an ASCII-only
      // fold would split tokens the oracle keeps intact (review find)
      val lc = Character.toLowerCase(cp)
      val c = if (lc < 128) lc.toChar else ' '
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else flush()
      val isAlnumOrSpace =
        (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') || cp == ' '
      if (!isAlnumOrSpace) nPunct += 1
      i += Character.charCount(cp)
    }
    flush()
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      nTokens, uniq.size,
      stopCounts(0), stopCounts(1), stopCounts(2), stopCounts(3),
      sumLen, nPunct))
  }

  /** Sign-random-projection signature for the embedding near-dup LSH:
    * 12 deterministic hyperplanes w[j][i] = ((i*1103 + j*907) % 2001 -
    * 1000)/1000 over a 64-dim float vector; per plane, FLOAT elements are
    * widened to DOUBLE, multiplied by the DOUBLE weight, and accumulated
    * left-to-right — exactly the SQL `aggregate(zip_with(...))` form the
    * DuckDB oracle replays, so signs are bit-identical. */
  def evalSrp12(arr: ArrayData): ArrayData = evalSrp(arr, 12)

  /** The width-parameterized generalization: `nbits` hyperplanes from the
    * same deterministic family. Bucket occupancy under (bands × width)
    * banding is N / 2^width per band — width is the LSH occupancy knob
    * that must grow ~log2(N) at scale (see ann_range_search's scaladoc);
    * the j-index formula is shared with the 12-plane demo signature so
    * width w ≤ 12 prefixes agree lane-for-lane with graft_srp12. */
  def evalSrp(arr: ArrayData, nbits: Int): ArrayData = {
    // validated HERE, not in nullSafeEval, so the codegen path (which
    // calls this directly) enforces the same bound — a negative width
    // would otherwise surface as a NegativeArraySizeException
    require(nbits >= 1 && nbits <= 1024,
      s"graft_srp nbits must be in [1, 1024], got $nbits")
    val emb = arr.toFloatArray()
    val out = new Array[Int](nbits)
    var j = 0
    while (j < nbits) {
      var acc = 0.0
      var i = 1
      val n = math.min(64, emb.length)
      while (i <= n) {
        val w = ((i * 1103 + j * 907) % 2001 - 1000).toDouble / 1000.0
        acc += emb(i - 1).toDouble * w
        i += 1
      }
      out(j) = if (acc >= 0) 1 else 0
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  val textStatsType: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_uniq", IntegerType, nullable = false),
    StructField("s_en", IntegerType, nullable = false),
    StructField("s_es", IntegerType, nullable = false),
    StructField("s_de", IntegerType, nullable = false),
    StructField("s_fr", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false)))

  private val Self = "graft.functions.HashExpressions$.MODULE$"

  /** text -> array<long> of token poly-hashes (with multiplicity). */
  case class TokenHashesExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = evalTokenHashes(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"${Self}.evalTokenHashes($c)")
    override protected def withNewChildInternal(c: Expression): TokenHashesExpr = copy(c)
    override def prettyName: String = "graft_token_hashes"
  }

  /** text -> array<long> of distinct 3-token shingle hashes. */
  case class ShingleSetExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = evalShingles(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"${Self}.evalShingles($c)")
    override protected def withNewChildInternal(c: Expression): ShingleSetExpr = copy(c)
    override def prettyName: String = "graft_shingles"
  }

  /** text -> array<long>(16) MinHash signature (null-free; docs with no
    * shingles yield Long.MaxValue sentinels — filter on graft_shingles). */
  case class MinHashSigExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = evalMinhashSig(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"${Self}.evalMinhashSig($c)")
    override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(c)
    override def prettyName: String = "graft_minhash_sig"
  }

  /** text -> 60-bit SimHash fingerprint. */
  case class SimHashExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = evalSimhash(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"${Self}.evalSimhash($c)")
    override protected def withNewChildInternal(c: Expression): SimHashExpr = copy(c)
    override def prettyName: String = "graft_simhash"
  }

  /** text -> array<long> of distinct rolling char-5-gram hashes. */
  case class Gram5Expr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = evalGram5(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"${Self}.evalGram5($c)")
    override protected def withNewChildInternal(c: Expression): Gram5Expr = copy(c)
    override def prettyName: String = "graft_gram5"
  }

  /** text -> array<long> of distinct rolling 8-token window hashes. */
  case class WinHash8Expr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = evalWinHash8(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"${Self}.evalWinHash8($c)")
    override protected def withNewChildInternal(c: Expression): WinHash8Expr = copy(c)
    override def prettyName: String = "graft_winhash8"
  }

  /** text -> array<int> of 1-based content-defined chunk boundary
    * positions (rolling 16-char hash ≡ 0 mod 64). */
  case class CdcBoundsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(v: Any): Any = evalCdcBounds(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"${Self}.evalCdcBounds($c)")
    override protected def withNewChildInternal(c: Expression): CdcBoundsExpr = copy(c)
    override def prettyName: String = "graft_cdc_bounds"
  }

  /** array<float> cosine similarity with the oracle-parity contract:
    * element products in FLOAT, accumulation left-to-right in DOUBLE,
    * final division in DOUBLE — bit-identical to the SQL higher-order-
    * function form and to DuckDB's replay. */
  case class CosineExpr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      evalCosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Self.evalCosine($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineExpr =
      copy(l, r)
    override def prettyName: String = "graft_cosine"
  }

  /** Count of DISTINCT common elements of two SORTED numeric arrays — the
    * verify-stage replacement for `size(array_intersect(a, b))`, which
    * builds a hash set AND materializes the intersection array per pair
    * when only the count is needed. The merge scan is O(|a|+|b|) with
    * ZERO allocation per row; callers pre-sort ONCE per doc (map-side
    * `sort_array` on the slim table) while array_intersect re-hashed per
    * CANDIDATE PAIR — the multiplicity a hot doc's array is replicated
    * into is exactly the verify-cost constant. Duplicate runs are skipped
    * on both sides, so the count equals array_intersect's distinct
    * semantics even on non-distinct inputs. */
  def evalSortedInterInt(l: ArrayData, r: ArrayData): Int = {
    val a = l.toIntArray(); val b = r.toIntArray()
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        c += 1
        while (i < a.length && a(i) == x) i += 1
        while (j < b.length && b(j) == y) j += 1
      }
    }
    c
  }

  /** Long twin of [[evalSortedInterInt]] (shingle/minhash domains > 2^31). */
  def evalSortedInterLong(l: ArrayData, r: ArrayData): Int = {
    val a = l.toLongArray(); val b = r.toLongArray()
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        c += 1
        while (i < a.length && a(i) == x) i += 1
        while (j < b.length && b(j) == y) j += 1
      }
    }
    c
  }

  /** `graft_sorted_inter(a, b)`: distinct-intersection COUNT of two sorted
    * int/long arrays (see [[evalSortedInterInt]]).
    *
    * CONTRACT (enforced where the type system can see it): both inputs
    * must be sorted ascending — the merge walk silently undercounts on
    * unsorted input (it is the caller's prepaid `sort_array`, done once
    * per row instead of per pair, that buys the speedup) — and element
    * nulls are rejected at ANALYSIS time (`containsNull = true` fails
    * type-check): `toIntArray`/`toLongArray` read null slots as garbage,
    * so unlike `array_intersect` there is no null-element semantics to
    * offer. Sortedness itself is not machine-checkable at plan time;
    * it is asserted by the HashProperties law suite instead. */
  case class SortedInterCountExpr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = IntegerType
    private def isLong: Boolean = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(IntegerType, false), ArrayType(IntegerType, false)) |
             (ArrayType(LongType, false), ArrayType(LongType, false)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (ArrayType(it @ (IntegerType | LongType), _),
              ArrayType(jt @ (IntegerType | LongType), _)) if it == jt =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            "graft_sorted_inter does not accept arrays with nullable elements " +
              "(containsNull = true): the merge walk has no null semantics and " +
              "would read null slots as garbage — array_compact or filter nulls first")
        case (l, r) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_sorted_inter requires two array<int> or two array<bigint> args " +
              s"with non-nullable elements, got $l, $r")
      }
    override def nullSafeEval(l: Any, r: Any): Any =
      if (isLong) evalSortedInterLong(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
      else evalSortedInterInt(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = if (isLong) "evalSortedInterLong" else "evalSortedInterInt"
      defineCodeGen(ctx, ev, (a, b) => s"$Self.$fn($a, $b)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedInterCountExpr =
      copy(l, r)
    override def prettyName: String = "graft_sorted_inter"
  }

  /** text -> 64-bit raw-char polynomial hash (document fingerprint). */
  case class PolyHashExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = evalPolyHash(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalPolyHash($c)")
    override protected def withNewChildInternal(c: Expression): PolyHashExpr = copy(c)
    override def prettyName: String = "graft_polyhash"
  }

  /** text -> struct of single-pass token/stopword/punctuation statistics. */
  case class TextStatsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = textStatsType
    override def nullSafeEval(v: Any): Any = evalTextStats(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalTextStats($c)")
    override protected def withNewChildInternal(c: Expression): TextStatsExpr = copy(c)
    override def prettyName: String = "graft_text_stats"
  }

  /** array<float> -> array<int>(12) sign-random-projection signature. */
  case class Srp12Expr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(v: Any): Any = evalSrp12(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalSrp12($c)")
    override protected def withNewChildInternal(c: Expression): Srp12Expr = copy(c)
    override def prettyName: String = "graft_srp12"
  }

  /** Width-parameterized SRP signature — `graft_srp(embedding, nbits)`.
    * Same hyperplane family as graft_srp12 (w ≤ 12 prefixes agree), with
    * the bit count as the LSH occupancy knob for corpus-sized banding. */
  case class SrpExpr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"graft_srp requires (array<float>, int), got (${l.simpleString}, ${r.simpleString})")
      }
    }
    override def nullSafeEval(l: Any, r: Any): Any =
      evalSrp(l.asInstanceOf[ArrayData], r.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Self.evalSrp($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SrpExpr =
      copy(l, r)
    override def prettyName: String = "graft_srp"
  }

  /** ONE (name, arity, builder) list serving BOTH registration paths —
    * the per-session temp-function [[register]] and the cluster-wide
    * [[graft.GraftExtensions]]. A function added here reaches both
    * automatically (review find: the extensions path had silently fallen
    * two functions behind this list). Builders are arity-checked so a
    * wrong-arity SQL call fails analysis with a clear message instead of
    * an IndexOutOfBoundsException from `es(1)`. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = {
    def checked(name: String, arity: Int)(b: Seq[Expression] => Expression): (String, Seq[Expression] => Expression) =
      name -> { es =>
        if (es.length != arity)
          throw new IllegalArgumentException(
            s"$name requires exactly $arity argument(s), got ${es.length}")
        b(es)
      }
    Seq(
      checked("graft_token_hashes", 1)(es => TokenHashesExpr(es.head)),
      checked("graft_shingles", 1)(es => ShingleSetExpr(es.head)),
      checked("graft_minhash_sig", 1)(es => MinHashSigExpr(es.head)),
      checked("graft_simhash", 1)(es => SimHashExpr(es.head)),
      checked("graft_gram5", 1)(es => Gram5Expr(es.head)),
      checked("graft_winhash8", 1)(es => WinHash8Expr(es.head)),
      checked("graft_cdc_bounds", 1)(es => CdcBoundsExpr(es.head)),
      checked("graft_cosine", 2)(es => CosineExpr(es.head, es(1))),
      checked("graft_sorted_inter", 2)(es => SortedInterCountExpr(es.head, es(1))),
      checked("graft_polyhash", 1)(es => PolyHashExpr(es.head)),
      checked("graft_text_stats", 1)(es => TextStatsExpr(es.head)),
      checked("graft_srp12", 1)(es => Srp12Expr(es.head)),
      checked("graft_srp", 2)(es => SrpExpr(es.head, es(1))),
      // Spark's own runtime-filter Bloom expressions (used internally for
      // InjectRuntimeFilter but not exposed in the public FunctionRegistry
      // as of 4.1.2) — surfaced here so bloom_membership stays fully
      // native: the aggregate builds the sketch engine-side, the probe is
      // a codegen'd Predicate, and no Scala UDF / driver-side
      // `stat.bloomFilter` collect is involved. might_contain requires its
      // sketch argument to be foldable or a scalar subquery, which is how
      // the operator supplies it.
      checked("graft_bloom_agg", 3)(es =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(es.head, es(1), es(2))),
      checked("graft_might_contain", 2)(es =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(es.head, es(1))))
  }

  /** Register all graft_* functions for use in selectExpr/spark.sql.
    * Idempotent per session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
