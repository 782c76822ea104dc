package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.HashExpressions._

/** Library-grade session integration: injects every graft_* native function
  * at session-build time via the standard extensions mechanism —
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`. This is
  * the packaging a user of the library deploys cluster-wide (functions are
  * present in every session, SQL and DataFrame API alike) — the
  * per-session [[graft.functions.HashExpressions.register]] temp-function
  * path remains for ad-hoc use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def inject(e: SparkSessionExtensions, name: String,
      builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.HashExpressions", name),
      builder))

  override def apply(e: SparkSessionExtensions): Unit = {
    inject(e, "graft_token_hashes", es => TokenHashesExpr(es.head))
    inject(e, "graft_shingles", es => ShingleSetExpr(es.head))
    inject(e, "graft_minhash_sig", es => MinHashSigExpr(es.head))
    inject(e, "graft_simhash", es => SimHashExpr(es.head))
    inject(e, "graft_gram5", es => Gram5Expr(es.head))
    inject(e, "graft_cosine", es => CosineExpr(es.head, es(1)))
    inject(e, "graft_polyhash", es => PolyHashExpr(es.head))
    inject(e, "graft_text_stats", es => TextStatsExpr(es.head))
    inject(e, "graft_srp12", es => Srp12Expr(es.head))
  }
}
