package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Portable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.immutable.ListMap

/** Text-analysis operators over the `documents` table: language ID
  * (stopword-vote heuristic), quality scoring, token counting, document
  * fingerprinting (rolling hash). All are single-pass, shuffle-free
  * per-row transforms — at 100 TB they run map-side inside whole-stage
  * codegen with no data movement.
  */
object TextOps {

  private val stop = graft.functions.Stopwords.lists

  private def arrLit(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("array(", ", ", ")")
  private def listLit(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  private def scoreSql(lang: String): String =
    s"size(filter(toks, t -> array_contains(${arrLit(stop(lang))}, t)))"
  private def duckScoreSql(lang: String): String =
    s"len(list_filter(toks, t -> list_contains(${listLit(stop(lang))}, t)))"

  val defs: ListMap[String, QueryDef] = ListMap(

    // ---- language identification: stopword vote with deterministic
    // tie-break (fixed precedence chain) ------------------------------------
    "text_lang_id" -> QueryDef(
      (s, dir) => {
        graft.functions.HashExpressions.register(s)
        Tables.load(s, dir, "documents")
          .selectExpr("doc_id", "lang AS labeled_lang", "graft_text_stats(text) AS st")
          .selectExpr("doc_id", "labeled_lang",
            "st.s_en AS s_en", "st.s_es AS s_es",
            "st.s_de AS s_de", "st.s_fr AS s_fr")
          .selectExpr("doc_id", "labeled_lang",
            """CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
              |     WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
              |     WHEN s_de >= s_fr THEN 'de'
              |     ELSE 'fr' END AS pred_lang""".stripMargin,
            "s_en", "s_es", "s_de", "s_fr")
          .transform(graft.Sorted.byNames(_, "doc_id"))
      },
      s"""WITH t AS (SELECT doc_id, lang AS labeled_lang,
         |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> length(t) > 0) AS toks
         |  FROM documents),
         |sc AS (SELECT doc_id, labeled_lang,
         |  ${duckScoreSql("en")} AS s_en, ${duckScoreSql("es")} AS s_es,
         |  ${duckScoreSql("de")} AS s_de, ${duckScoreSql("fr")} AS s_fr
         |  FROM t)
         |SELECT doc_id, labeled_lang,
         |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
         |       WHEN s_de >= s_fr THEN 'de'
         |       ELSE 'fr' END AS pred_lang,
         |  s_en, s_es, s_de, s_fr
         |FROM sc ORDER BY doc_id""".stripMargin),

    // ---- quality scoring: length/punctuation/stopword/uniqueness ratios ---
    "text_quality" -> QueryDef(
      (s, dir) => {
        graft.functions.HashExpressions.register(s)
        Tables.load(s, dir, "documents")
          .selectExpr("doc_id", "n_chars", "graft_text_stats(text) AS st")
          .selectExpr("doc_id", "n_chars", "st.n_punct AS n_punct",
            "st.n_tokens AS n_tokens",
            "st.n_uniq AS n_uniq",
            "st.s_en AS n_stop",
            "st.sum_len AS sum_len")
          .selectExpr("doc_id", "n_chars", "n_tokens", "n_uniq", "n_punct",
            "CAST(sum_len AS DOUBLE) / n_tokens AS avg_token_len",
            "CAST(n_uniq AS DOUBLE) / n_tokens AS uniq_ratio",
            "CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio",
            """least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
              | + CAST(n_uniq AS DOUBLE) / n_tokens * 0.3
              | + CAST(n_stop AS DOUBLE) / n_tokens * 0.3 AS quality""".stripMargin)
          .transform(graft.Sorted.byNames(_, "doc_id"))
      },
      s"""WITH t AS (SELECT doc_id, n_chars,
         |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> length(t) > 0) AS toks,
         |  length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct
         |  FROM documents),
         |m AS (SELECT doc_id, n_chars, n_punct,
         |  len(toks) AS n_tokens, len(list_distinct(toks)) AS n_uniq,
         |  ${duckScoreSql("en")} AS n_stop,
         |  list_reduce(list_prepend(0::BIGINT, list_transform(toks, t -> length(t)::BIGINT)), (a, b) -> a + b) AS sum_len
         |  FROM t)
         |SELECT doc_id, n_chars, n_tokens, n_uniq, n_punct,
         |  CAST(sum_len AS DOUBLE) / n_tokens AS avg_token_len,
         |  CAST(n_uniq AS DOUBLE) / n_tokens AS uniq_ratio,
         |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
         |  least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |   + CAST(n_uniq AS DOUBLE) / n_tokens * 0.3
         |   + CAST(n_stop AS DOUBLE) / n_tokens * 0.3 AS quality
         |FROM m ORDER BY doc_id""".stripMargin),

    // ---- token counting: whitespace split, alnum-word extraction, and a
    // BPE-ish segmentation (letter runs | digit runs | punctuation runs —
    // the pre-merge word-splitting shape of GPT-style tokenizers) -----------
    "token_counts" -> QueryDef(
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .selectExpr("doc_id", "source",
            "size(filter(split(text, '\\\\s+'), t -> length(t) > 0)) AS n_ws_tokens",
            "size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS n_re_tokens",
            "size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]+', 0)) AS n_bpe_tokens",
            "n_chars")
          .transform(graft.Sorted.byNames(_, "doc_id"))
      },
      """SELECT doc_id, source,
        | len(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)) AS n_ws_tokens,
        | len(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS n_re_tokens,
        | len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+', 0)) AS n_bpe_tokens,
        | n_chars
        |FROM documents ORDER BY doc_id""".stripMargin),

    // ---- text normalization: lowercase + whitespace-run collapse + trim —
    // the canonicalization step before dedup/tokenization in a training
    // pipeline. Map-side; fingerprint of the normalized form via the
    // native graft_polyhash so the oracle can replay it char-wise. ----------
    "text_normalize" -> QueryDef(
      (s, dir) => {
        graft.functions.HashExpressions.register(s)
        Tables.load(s, dir, "documents")
          .selectExpr("doc_id",
            "trim(regexp_replace(lower(text), '\\\\s+', ' ')) AS norm")
          .selectExpr("doc_id", "length(norm) AS norm_len",
            "graft_polyhash(norm) AS norm_fp")
          .transform(graft.Sorted.byNames(_, "doc_id"))
      },
      s"""WITH n AS (
         |  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
         |  FROM documents)
         |SELECT doc_id, length(norm) AS norm_len,
         |  list_reduce(list_prepend(0::BIGINT,
         |    list_transform(range(1, length(norm) + 1), i -> ascii(substr(norm, i, 1))::BIGINT)),
         |    (h, ch) -> (h * 31 + ch) % ${Portable.P}) AS norm_fp
         |FROM n ORDER BY doc_id""".stripMargin),

    // ---- document fingerprint: char-level rolling hash (base 31 mod P) of
    // the full text plus a first-8-token prefix fingerprint ------------------
    "doc_fingerprint" -> QueryDef(
      (s, dir) => {
        graft.functions.HashExpressions.register(s)
        Tables.load(s, dir, "documents")
          .selectExpr("doc_id",
            "graft_polyhash(text) AS fp",
            // token char-hashes are native; only the 8-element prefix fold
            // stays a (tiny) SQL lambda
            s"""aggregate(slice(graft_token_hashes(text), 1, 8),
               | bigint(0), (h, x) -> (h * 131 + x) % ${Portable.P}L) AS prefix_fp""".stripMargin)
          .transform(graft.Sorted.byNames(_, "doc_id"))
      },
      s"""SELECT doc_id,
         | list_reduce(list_prepend(0::BIGINT,
         |   list_transform(range(1, length(text) + 1), i -> ascii(substr(text, i, 1))::BIGINT)),
         |   (h, ch) -> (h * 31 + ch) % ${Portable.P}) AS fp,
         | list_reduce(list_prepend(0::BIGINT,
         |   list_transform(
         |     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> length(t) > 0)[1:8],
         |     t -> list_reduce(list_prepend(0::BIGINT,
         |       list_transform(range(1, length(t) + 1), i -> ascii(substr(t, i, 1))::BIGINT)),
         |       (h, ch) -> (h * 31 + ch) % ${Portable.P}))),
         |   (h, x) -> (h * 131 + x) % ${Portable.P}) AS prefix_fp
         |FROM documents ORDER BY doc_id""".stripMargin)
  )
}
