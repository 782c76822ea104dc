package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure kernels of the round-4 corpus operators:
  * the chunking index formula (coverage / progress / maximality laws over
  * arbitrary document lengths), the mix-rebalance keep-rate arithmetic
  * (bounds, no-up-sampling, target-respecting), and the PII redaction
  * pass (idempotence, no surviving matches). Each law mirrors the SQL
  * the operators execute; the SQL side itself is pinned by the oracle at
  * sf0.01 and the boundary-length cases in CorpusOpsSpec.
  */
object CorpusProperties extends Properties("graft.corpus") {

  // ---- chunk_text: starts 0, 192, 384, …; max index 0 for len <= 256,
  // else (len - 65) / 192 — the exact CASE the query plans ---------------
  private val Size = 256
  private val Stride = 192
  private val Overlap = Size - Stride // 64

  private def chunkStarts(len: Long): Seq[Long] = {
    val maxIdx = if (len <= Size) 0L else (len - Overlap - 1) / Stride
    (0L to maxIdx).map(_ * Stride)
  }

  private val docLen: Gen[Long] = Gen.chooseNum(1L, 2000L)

  property("chunks cover every character (no gaps, last chunk reaches EOF)") =
    forAll(docLen) { len =>
      val ss = chunkStarts(len)
      val contiguous = ss.sliding(2).forall {
        case Seq(a, b) => b <= a + Size // next window starts inside previous
        case _ => true
      }
      contiguous && ss.head == 0 && ss.last + Size >= len
    }

  property("every chunk past the first adds new content") =
    forAll(docLen) { len =>
      chunkStarts(len).drop(1).forall(s => s + Overlap < len)
    }

  property("maximality: one more chunk would be wholly contained") =
    forAll(docLen) { len =>
      val next = (chunkStarts(len).last / Stride + 1) * Stride
      next + Overlap >= len
    }

  // ---- mix_rebalance: keep_m = least(1000, ((total div n) * 1000) div cnt)
  private val counts: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(1L, 1000000000L)).map(_.take(50))

  private def keepM(total: Long, n: Long, cnt: Long): Long =
    math.min(1000L, ((total / n) * 1000L) / cnt)

  property("keep rates are bounded, never up-sample, and respect the target") =
    forAll(counts) { cs =>
      val total = cs.sum
      val n = cs.size.toLong
      val target = total / n
      cs.forall { cnt =>
        val m = keepM(total, n, cnt)
        val bounded = m >= 0 && m <= 1000
        // an under-represented source keeps everything
        val noUpsample = cnt > target || m == 1000
        // expected kept (m/1000 of cnt) never exceeds the uniform target
        val respectsTarget = m == 1000 || m * cnt / 1000 <= target
        bounded && noUpsample && respectsTarget
      }
    }

  // ---- pii_redact: replacement tokens contain no digits or '@', so the
  // pass is idempotent and leaves no surviving matches --------------------
  private def redact(s: String): String = s
    .replaceAll(CorpusOps.EmailRe, "<EMAIL>")
    .replaceAll(CorpusOps.PhoneRe, "<PHONE>")
    .replaceAll(CorpusOps.IpRe, "<IP>")

  private val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
  private val email: Gen[String] =
    Gen.zip(word, word).map { case (u, d) => s"$u@$d.com" }
  private val phone: Gen[String] =
    Gen.chooseNum(0, 9999).map(n => f"415-555-$n%04d")
  private val ip: Gen[String] =
    Gen.listOfN(4, Gen.chooseNum(0, 255)).map(_.mkString("."))
  private val payload: Gen[String] =
    Gen.listOf(Gen.frequency(6 -> word, 2 -> email, 1 -> phone, 1 -> ip))
      .map(_.mkString(" "))

  property("redaction is idempotent") = forAll(payload) { s =>
    val once = redact(s)
    redact(once) == once
  }

  property("no pattern survives redaction") = forAll(payload) { s =>
    val r = redact(s)
    Seq(CorpusOps.EmailRe, CorpusOps.PhoneRe, CorpusOps.IpRe)
      .forall(p => !p.r.findFirstIn(r).isDefined)
  }
}
