package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.collection.immutable.ListMap

/** Tokenizer-training operators over `documents`: the byte-pair-encoding
  * merge-table build — the one preprocessing artifact an LLM data pipeline
  * derives from the corpus itself (the reference has no tokenizer layer;
  * this extends the engine's LLM-data surface alongside [[TextOps]]).
  *
  * Scale design: classic BPE trains on the WORD-FREQUENCY table, not the
  * corpus — the corpus is touched exactly once (tokenize → explode →
  * count), a corpus-linear partial+final aggregation, and every merge
  * iteration then runs over the compact vocabulary (distinct words ×
  * weight). Per iteration: one partial+final pair count, one
  * TakeOrdered(1) argmax, and the winning pair applied via a 1-row
  * broadcast — no driver-side collect, no corpus re-scan, plan depth
  * bounded by localCheckpoint per round (same recipe as
  * Graph.pagerank_pages).
  *
  * Cross-engine parity: a word's symbol sequence is encoded as a string
  * with every symbol carrying its OWN leading+trailing space
  * (" l  o  w "), so applying a merge is a plain non-overlapping
  * left-to-right `replace(enc, ' l  o ', ' lo ')` — identical semantics in
  * the JVM and DuckDB, including consecutive-merge cases like "a a a a"
  * where separator-sharing encodings go wrong. Ties on pair count break by
  * pair string ascending in both engines (symbols are lowercase alnum, so
  * byte order == lexicographic order).
  */
object Tokenizer {

  /** Merge-table depth. 16 is production-shaped (a real tokenizer runs
    * thousands of rounds of exactly this loop; each round's cost profile —
    * one vocab-sized pair count, one argmax, one broadcast apply — is
    * already the steady state at step 16). The exhaustion guard below
    * makes any Steps value safe on degenerate corpora. */
  private val Steps = 16

  /** Pairs of adjacent symbols from the padded encoding, as "lhs rhs"
    * keys; symbols never contain spaces so the key splits back safely. */
  private val pairsExpr =
    """CASE WHEN size(syms) > 1 THEN
      |  transform(sequence(1, size(syms) - 1),
      |    i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1)))
      |ELSE array() END""".stripMargin

  /** The training loop shared by `tokenizer_vocab` (emits the merge
    * table) and `tokenizer_apply` (emits the post-merge word encodings):
    * one corpus pass for word frequencies, then Steps rounds of pair
    * count + argmax + broadcast-applied merge over the vocabulary. */
  private def train(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame]) = {
    val d = Tables.load(s, dir, "documents")
    // the ONLY corpus-wide pass: tokenize, explode, count each word
    val vocab = d
      .selectExpr(s"explode(${graft.functions.Portable.tokensSql("text")}) AS word")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    var words = vocab.selectExpr("word", "cnt",
      "concat_ws('', transform(sequence(1, length(word)), i -> concat(' ', substring(word, i, 1), ' '))) AS enc")
      .localCheckpoint(true)
    val merges = (1 to Steps).map { step =>
      val pc = words
        .withColumn("syms", split(trim(col("enc")), "  "))
        .select(col("cnt"), explode(expr(pairsExpr)).as("pair"))
        .groupBy("pair").agg(sum(col("cnt")).as("pair_count"))
      val best = pc.orderBy(col("pair_count").desc, col("pair").asc).limit(1)
        .selectExpr("element_at(split(pair, ' '), 1) AS lhs",
          "element_at(split(pair, ' '), 2) AS rhs", "pair_count")
        .localCheckpoint(true) // tiny; also pins one winner for both uses
      // pair exhaustion guard, IN the dataflow: if no mergeable pair
      // remains, best is EMPTY and a cross join would annihilate the
      // vocabulary — leaving tokenizer_apply to encode against zero words
      // (total silent data loss, review find). A broadcast LEFT join on
      // TRUE keeps every word with a NULL winner instead, and the CASE
      // passes the encoding through unchanged — the exact shape the DuckDB
      // oracle uses (LEFT JOIN bN ON TRUE below). This replaces the old
      // per-round `best.isEmpty` driver action: cosmetic at Steps=16, but
      // at a production Steps=30k it was 30k extra scheduler round-trips.
      words = words.join(broadcast(best), lit(true), "left")
        .selectExpr("word", "cnt",
          """CASE WHEN lhs IS NULL THEN enc
            |ELSE replace(enc, concat(' ', lhs, '  ', rhs, ' '), concat(' ', lhs, rhs, ' '))
            |END AS enc""".stripMargin)
        .localCheckpoint(true)
      best.selectExpr(s"CAST($step AS INT) AS step", "lhs", "rhs",
        "concat(lhs, rhs) AS merged", "pair_count")
    }
    (words, merges)
  }

  /** One generated oracle round n: pair counts over w(n-1), winner b(n),
    * post-merge encodings w(n). GENERATED, not hand-unrolled, so the
    * oracle's depth always equals [[Steps]] by construction. The w/b CTEs
    * are MATERIALIZED: each is referenced twice (the next round's pair
    * count AND the next encoding / final select), so default CTE inlining
    * would duplicate the whole prefix chain per reference — 2^Steps scans
    * of `documents` (observed as an fd-exhaustion failure at Steps=16). */
  private def duckStep(n: Int): String =
    s"""p$n AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS pair_count FROM (
       |    SELECT cnt, unnest(list_transform(range(1, len(syms)), i -> syms[i] || ' ' || syms[i+1])) AS pair
       |    FROM (SELECT cnt, string_split(trim(enc), '  ') AS syms FROM w${n - 1})) GROUP BY pair),
       |b$n AS MATERIALIZED (SELECT split_part(pair, ' ', 1) AS lhs, split_part(pair, ' ', 2) AS rhs, pair_count
       |  FROM p$n ORDER BY pair_count DESC, pair LIMIT 1),
       |w$n AS MATERIALIZED (SELECT word, cnt,
       |    CASE WHEN lhs IS NULL THEN enc
       |         ELSE replace(enc, ' ' || lhs || '  ' || rhs || ' ', ' ' || lhs || rhs || ' ') END AS enc
       |  FROM w${n - 1} LEFT JOIN b$n ON TRUE)""".stripMargin

  /** Shared oracle CTE chain: word vocab, padded encodings w0..w(Steps)
    * and merge winners b1..b(Steps) — `tokenizer_vocab` reads the
    * winners, `tokenizer_apply` reads the final encodings. */
  private val duckTrain: String =
    s"""toks AS (SELECT
        |    ${graft.functions.Portable.duckToksSql("text")} AS toks
        |  FROM documents),
        |vocab AS (SELECT t AS word, COUNT(*)::BIGINT AS cnt
        |  FROM (SELECT unnest(toks) AS t FROM toks) GROUP BY 1),
        |w0 AS MATERIALIZED (SELECT word, cnt,
        |    list_reduce(list_prepend('', list_transform(range(1, length(word) + 1),
        |      i -> ' ' || substr(word, i, 1) || ' ')), (a, b) -> a || b) AS enc
        |  FROM vocab),
        |${(1 to Steps).map(duckStep).mkString(",\n")}""".stripMargin

  val defs: ListMap[String, QueryDef] = ListMap(

    // ---- BPE merge table: Steps merge rounds over the corpus
    // word-frequency table; output = (step, lhs, rhs, merged, pair_count) ----
    "tokenizer_vocab" -> QueryDef(
      (s, dir) => train(s, dir)._2.reduce(_.unionAll(_)).orderBy("step"),
      s"""WITH $duckTrain
        |${(1 to Steps).map(n =>
           s"SELECT CAST($n AS INT) AS step, lhs, rhs, lhs || rhs AS merged, pair_count FROM b$n")
           .mkString("\nUNION ALL ")}
        |ORDER BY step""".stripMargin),

    // ---- apply the learned merges: encode every document with the
    // trained vocabulary and report the compression the tokenizer buys.
    // Scale shape: the trained word->encoding table is VOCABULARY-sized
    // and broadcasts onto the corpus token stream (one corpus-linear
    // explode, the same single pass training took); per-doc symbol counts
    // are a partial+final fold. This is the encode step of the BPE story —
    // train (tokenizer_vocab) then apply, both driver-checked. ------------
    "tokenizer_apply" -> QueryDef(
      (s, dir) => {
        val words = train(s, dir)._1 // (word, cnt, enc) after all merges
        Tables.load(s, dir, "documents")
          .selectExpr("doc_id",
            s"explode(${graft.functions.Portable.tokensSql("text")}) AS word")
          .join(broadcast(words.selectExpr("word",
            "size(split(trim(enc), '  ')) AS ns", "length(word) AS wl")), "word")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("ns")).as("n_symbols"),
            sum(col("wl")).as("n_token_chars"))
          .selectExpr("doc_id", "n_words", "n_symbols", "n_token_chars",
            "CAST(n_token_chars AS DOUBLE) / n_symbols AS chars_per_symbol")
          .transform(graft.Sorted.byNames(_, "doc_id"))
      },
      s"""WITH $duckTrain,
         |dtoks AS (SELECT doc_id,
         |    ${graft.functions.Portable.duckToksSql("text")} AS ts
         |  FROM documents),
         |dw AS (SELECT doc_id, unnest(ts) AS word FROM dtoks),
         |enc AS (SELECT word, len(string_split(trim(enc), '  ')) AS ns, length(word) AS wl FROM w$Steps)
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(ns) AS BIGINT) AS n_symbols,
         |  CAST(SUM(wl) AS BIGINT) AS n_token_chars,
         |  CAST(CAST(SUM(wl) AS BIGINT) AS DOUBLE) / CAST(SUM(ns) AS BIGINT) AS chars_per_symbol
         |FROM dw JOIN enc USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // ---- per-language fertility of the learned tokenizer: mean BPE
    // symbols per word (per-mille, integer-exact) — THE multilingual
    // tokenizer-eval metric (a high-fertility language pays proportionally
    // more compute per word at training AND inference, which is how
    // vocab-allocation decisions are made). Same machinery as
    // tokenizer_apply — the trained encodings broadcast onto one corpus
    // word explode — but rolled up to |langs| rows: the aggregation is
    // combiner-perfect (≤ |langs| partial rows per map task) and the
    // whole result fits on a postcard at any corpus size. -----------------
    "tokenizer_fertility" -> QueryDef(
      (s, dir) => {
        val words = train(s, dir)._1
        Tables.load(s, dir, "documents")
          .selectExpr("lang",
            s"explode(${graft.functions.Portable.tokensSql("text")}) AS word")
          .join(broadcast(words.selectExpr("word",
            "size(split(trim(enc), '  ')) AS ns", "length(word) AS wl")), "word")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("ns")).as("n_symbols"),
            sum(col("wl")).as("n_chars"))
          .selectExpr("lang", "n_words", "n_symbols", "n_chars",
            "(n_symbols * 1000L) div n_words AS fertility_mille",
            "(n_chars * 1000L) div n_symbols AS chars_per_symbol_mille")
          .transform(graft.Sorted.byNames(_, "lang"))
      },
      s"""WITH $duckTrain,
         |dtoks AS (SELECT lang,
         |    ${graft.functions.Portable.duckToksSql("text")} AS ts
         |  FROM documents),
         |dw AS (SELECT lang, unnest(ts) AS word FROM dtoks),
         |enc AS (SELECT word, len(string_split(trim(enc), '  ')) AS ns, length(word) AS wl FROM w$Steps),
         |agg AS (SELECT lang, COUNT(*) AS n_words,
         |    CAST(SUM(ns) AS BIGINT) AS n_symbols,
         |    CAST(SUM(wl) AS BIGINT) AS n_chars
         |  FROM dw JOIN enc USING (word) GROUP BY lang)
         |SELECT lang, n_words, n_symbols, n_chars,
         |  (n_symbols * 1000) // n_words AS fertility_mille,
         |  (n_chars * 1000) // n_symbols AS chars_per_symbol_mille
         |FROM agg ORDER BY lang""".stripMargin)
  )
}
