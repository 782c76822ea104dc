package graft.operators

import graft.{QueryDef, Sorted, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.collection.immutable.ListMap

/** Corpus-hygiene + dataloader operators over the `documents` table — the
  * cleaning passes a large-scale training-data pipeline runs between raw
  * crawl and tokenization (beyond the reference's scope; part of the
  * LLM-ops surface BASELINE.md grades as first-class):
  *
  *  - `pii_redact`         — regex scrubbing of emails/phones/IPs, map-side
  *  - `boilerplate_flag`   — CCNet/Dolma-style repeated-shingle detection:
  *                           global doc-frequency shuffle + per-doc fraction
  *  - `ngram_top_corpus`   — corpus-wide heavy-hitter bigrams (top-k agg)
  *  - `chunk_text`         — overlapping fixed-size chunk explode (the
  *                           context-window dataloader shape)
  *
  * Scale notes (SCALE.md has the full arguments):
  *  - pii_redact / chunk_text are single-pass, shuffle-free per-row
  *    transforms — at 100 TB they run map-side inside whole-stage codegen.
  *  - boilerplate_flag shuffles SHINGLES once for the doc-frequency count
  *    (linear in corpus, the unavoidable global pass), then joins the
  *    heavy set back BROADCAST: by construction the heavy set (shingles in
  *    ≥ df_min distinct docs) is orders of magnitude smaller than the
  *    corpus; if a pathological corpus made it large, swap the broadcast
  *    for a shuffle join on `g` — the plan is otherwise unchanged.
  *  - ngram_top_corpus is partial+final count with TakeOrderedAndProject:
  *    ≤ k rows cross the final stage regardless of corpus size.
  */
object CorpusOps {

  // RE2-compatible (DuckDB) AND java.util.regex-compatible (Spark): plain
  // character classes, bounded repeats, no backrefs/lookaround. Patterns
  // are passed through the DataFrame API, never a SQL literal, so there is
  // exactly ONE level of string escaping.
  private[operators] val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[operators] val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  private[operators] val IpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  // the SAME strings serve the DuckDB oracle: both sides are plain Scala
  // string interpolation (one escaping level), so aliasing keeps the two
  // engines' patterns impossible to desynchronize
  private val DEmail = EmailRe
  private val DPhone = PhoneRe
  private val DIp = IpRe

  // one tokenization contract for every corpus statistic in this module
  // (boilerplate shingles, bigrams) — same shape as TextOps' oracles
  private val toksExpr =
    "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')"
  private val duckToks = graft.functions.Portable.duckToksSql("text")

  /** Hashed-bigram bucket explosion over a `th` token-hash column — the
    * B = 8192 fixed feature space shared by `importance_hashed` and
    * `source_drift` (one definition per engine, the duckSigCtes rule).
    * bucket = ((h1*MIX + h2) % P) % B; h < P ≈ 1e9 so h*MIX ≈ 2.7e18
    * stays in int64. `sequence(2, size)` is DESCENDING for size < 2 (the
    * chunk_text pitfall) — the CASE guards it and types the empty branch. */
  // private[graft]: StreamingCuration's map-side classifier gate scores
  // over the SAME B = 8192 bigram feature fragment the batch trainer and
  // scorer use — a copied fragment desyncing would silently misroute
  // every streaming score to the wrong weight slot
  private[graft] val bigramBktExpr = {
    import graft.functions.Portable.{MIX, P}
    "CASE WHEN size(th) >= 2 THEN transform(sequence(2, size(th)), " +
      s"i -> ((element_at(th, i - 1) * ${MIX}L + element_at(th, i)) % ${P}L) % 8192) " +
      "ELSE CAST(array() AS array<bigint>) END"
  }
  // private[operators]: Curation's mix_doremi oracle scores with the SAME
  // B = 8192 bigram feature fragment (the bigramBktExpr desync rule)
  private[operators] val duckBigramBkt = {
    import graft.functions.Portable.{MIX, P}
    s"""CASE WHEN len(th) >= 2
       |    THEN list_transform(range(2, len(th) + 1),
       |      i -> ((th[i-1] * $MIX + th[i]) % $P) % 8192)
       |    ELSE CAST([] AS BIGINT[]) END""".stripMargin
  }

  val defs: ListMap[String, QueryDef] = ListMap(

    // ---- PII redaction: the fixture corpus is letters-only, so a
    // deterministic PII payload (synthetic email/phone/IP derived from
    // doc_id) is appended per row FIRST — the redaction is then exercised
    // on every row and verified by the md5 of the fully redacted string,
    // not just by match counts. Construction and redaction are mirrored
    // op-for-op in the oracle. Redaction order matters (email before IP:
    // the domain contains dots) and is identical both sides. -------------
    "pii_redact" -> QueryDef(
      (s, dir) => {
        val payload = concat(
          col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com call 415-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" from 192.168."), pmod(col("doc_id"), lit(256)).cast("string"),
          lit("."), pmod(col("doc_id") * 7, lit(256)).cast("string"))
        val redacted = regexp_replace(
          regexp_replace(
            regexp_replace(payload, EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          IpRe, "<IP>")
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            regexp_count(payload, lit(EmailRe)).cast("long").as("n_emails"),
            regexp_count(payload, lit(PhoneRe)).cast("long").as("n_phones"),
            regexp_count(payload, lit(IpRe)).cast("long").as("n_ips"),
            length(redacted).cast("long").as("redacted_len"),
            md5(redacted).as("redacted_md5"))
          .transform(Sorted.byNames(_, "doc_id"))
      },
      // DuckDB regexp_replace replaces only the FIRST match without the
      // 'g' flag — Spark always replaces all, so 'g' is load-bearing.
      s"""WITH p AS (SELECT doc_id,
         |  text || ' contact user' || CAST(doc_id AS VARCHAR)
         |    || '@mail.example.com call 415-555-'
         |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |    || ' from 192.168.' || CAST(doc_id % 256 AS VARCHAR)
         |    || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS payload
         |  FROM documents),
         |r AS (SELECT doc_id, payload,
         |  regexp_replace(regexp_replace(regexp_replace(payload,
         |    '$DEmail', '<EMAIL>', 'g'),
         |    '$DPhone', '<PHONE>', 'g'),
         |    '$DIp', '<IP>', 'g') AS red
         |  FROM p)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(payload, '$DEmail')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(payload, '$DPhone')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(payload, '$DIp')) AS BIGINT) AS n_ips,
         |  CAST(length(red) AS BIGINT) AS redacted_len,
         |  md5(red) AS redacted_md5
         |FROM r ORDER BY doc_id""".stripMargin),

    // ---- boilerplate detection: 5-token shingles occurring in >= 3
    // distinct docs are "boilerplate"; each doc reports the fraction of
    // its shingle instances that are boilerplate plus a >= 5% flag — the
    // repeated-line removal pass of CCNet/Dolma, at shingle granularity
    // (the fixture corpus has no newlines). ONE corpus-linear shuffle (the
    // doc-frequency count); the heavy set joins back broadcast. ----------
    "boilerplate_flag" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val toks = docs.select(col("doc_id"), expr(toksExpr).as("ts"))
        // Spark [] indexing is 0-based; slice() is 1-based — i in [5, size]
        // picks 1-based token window [i-4, i]
        // persisted: sh feeds BOTH the doc-frequency count and the
        // join-back — without this the tokenize+explode executes twice
        // (the slim two-column shape is the same trick the MinHash
        // signature table uses; Bench/Verify clear the cache per query)
        val sh = toks.select(col("doc_id"),
          explode(expr(
            "CASE WHEN size(ts) >= 5 THEN transform(sequence(5, size(ts)), " +
              "i -> concat_ws(' ', slice(ts, i - 4, 5))) " +
              "ELSE CAST(array() AS array<string>) END")).as("g"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val heavy = sh.groupBy(col("g"))
          .agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df") >= 3)
        val perDoc = sh.join(broadcast(heavy), Seq("g"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            coalesce(sum(col("df").isNotNull.cast("long")), lit(0L)).as("n_boiler"))
        docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
            coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
          .withColumn("boiler_frac",
            when(col("n_shingles") > 0,
              col("n_boiler").cast("double") / col("n_shingles").cast("double"))
              .otherwise(lit(0.0)))
          .withColumn("flagged", (col("boiler_frac") >= 0.05).cast("int"))
          .transform(Sorted.byNames(_, "doc_id"))
      },
      s"""WITH toks AS (SELECT doc_id, $duckToks AS ts
        |  FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(range(5, len(ts) + 1),
        |    i -> ts[i-4] || ' ' || ts[i-3] || ' ' || ts[i-2] || ' ' || ts[i-1] || ' ' || ts[i])) AS g
        |  FROM toks),
        |hv AS (SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS df FROM sh GROUP BY g)
        |  WHERE df >= 3),
        |per AS (SELECT s.doc_id, COUNT(*) AS n_shingles,
        |    CAST(SUM(CASE WHEN h.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
        |  FROM sh s LEFT JOIN hv h USING (g) GROUP BY s.doc_id)
        |SELECT d.doc_id,
        |  COALESCE(n_shingles, 0) AS n_shingles,
        |  COALESCE(n_boiler, 0) AS n_boiler,
        |  CASE WHEN COALESCE(n_shingles, 0) > 0
        |       THEN CAST(COALESCE(n_boiler, 0) AS DOUBLE) / n_shingles
        |       ELSE CAST(0 AS DOUBLE) END AS boiler_frac,
        |  CAST(CASE WHEN (CASE WHEN COALESCE(n_shingles, 0) > 0
        |       THEN CAST(COALESCE(n_boiler, 0) AS DOUBLE) / n_shingles
        |       ELSE CAST(0 AS DOUBLE) END) >= 0.05 THEN 1 ELSE 0 END AS INT) AS flagged
        |FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin),

    // ---- paragraph-level dedup REWRITE: boilerplate_flag's consumer.
    // Documents split into non-overlapping 16-token "paragraphs" (the
    // fixture corpus has no newlines; with real newline-delimited text the
    // paragraph expression swaps for split(text, '\n') and the rest of the
    // plan is unchanged); a paragraph appearing in >= 2 DISTINCT docs is
    // cross-document duplicated and is REMOVED from every copy — the
    // CCNet/Gopher repeated-passage scrub as a rewrite, verified by the
    // md5 of each rebuilt document (not just by counts). Scale shape: ONE
    // corpus-linear shuffle for the paragraph doc-frequency count keyed on
    // the 16-byte md5 of the paragraph (full paragraph text never
    // shuffles); the duplicated-key set — bounded by repeated content, the
    // boilerplate_flag argument — joins back BROADCAST; the rebuild is one
    // per-doc regroup of slim (pid, flag, ptext) rows. At petabyte scale
    // the regroup drops too: broadcast the dup-key set into a mapPartitions
    // hash-probe and rewrite each doc in place, map-side. ------------------
    "dedup_paragraph" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val paras = docs.select(col("doc_id"), expr(toksExpr).as("ts"))
          .select(col("doc_id"),
            posexplode(expr(
              "CASE WHEN size(ts) >= 1 THEN transform(sequence(1, (size(ts) + 15) div 16), " +
                "i -> concat_ws(' ', slice(ts, (i - 1) * 16 + 1, 16))) " +
                "ELSE CAST(array() AS array<string>) END")).as(Seq("pid", "ptext")))
          .withColumn("pkey", md5(col("ptext")))
          // feeds BOTH the doc-frequency count and the join-back
          .persist(StorageLevel.MEMORY_AND_DISK)
        val dup = paras.groupBy(col("pkey"))
          .agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df") >= 2)
          .select(col("pkey"))
        val per = paras.join(broadcast(dup.withColumn("hit", lit(1))), Seq("pkey"), "left")
          .select(col("doc_id"), col("pid"), col("ptext"),
            col("hit").isNotNull.as("dup"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_paras"),
            sum(col("dup").cast("long")).as("n_dropped"),
            array_sort(collect_list(struct(col("pid"), col("dup"), col("ptext")))).as("ps"))
          .selectExpr("doc_id", "n_paras", "n_dropped",
            "concat_ws(' ', transform(filter(ps, p -> NOT p.dup), p -> p.ptext)) AS cleaned")
        docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_paras"), lit(0L)).as("n_paras"),
            coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
            coalesce(length(col("cleaned")), lit(0)).cast("long").as("cleaned_len"),
            md5(coalesce(col("cleaned"), lit(""))).as("cleaned_md5"))
          .transform(Sorted.byNames(_, "doc_id"))
      },
      s"""WITH t AS (SELECT doc_id, $duckToks AS ts FROM documents),
         |p AS (SELECT doc_id, i AS pid,
         |    array_to_string(ts[((i-1)*16+1):((i-1)*16+16)], ' ') AS ptext
         |  FROM t, unnest(range(1, (len(ts)+15)//16 + 1)) AS u(i)),
         |dup AS (SELECT pkey FROM (
         |    SELECT md5(ptext) AS pkey, COUNT(DISTINCT doc_id) AS df FROM p GROUP BY 1)
         |  WHERE df >= 2),
         |m AS (SELECT p.doc_id, p.pid, p.ptext, d.pkey IS NOT NULL AS dup
         |  FROM p LEFT JOIN dup d ON md5(p.ptext) = d.pkey),
         |per AS (SELECT doc_id, COUNT(*) AS n_paras,
         |    CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |    COALESCE(array_to_string(list(ptext ORDER BY pid) FILTER (WHERE NOT dup), ' '), '') AS cleaned
         |  FROM m GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(n_paras, 0) AS n_paras,
         |  COALESCE(n_dropped, 0) AS n_dropped,
         |  CAST(length(COALESCE(cleaned, '')) AS BIGINT) AS cleaned_len,
         |  md5(COALESCE(cleaned, '')) AS cleaned_md5
         |FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin),

    // ---- cross-source contamination matrix: for every source pair, how
    // many distinct 5-token shingles they share — the "is src7 scraping
    // src3" report a corpus audit starts with. Scale shape: shingles
    // reduce to DISTINCT (source, shingle) rows first (≤ |sources| rows
    // per shingle, so the self-join fans out ≤ C(|sources|,2) = 190 pairs
    // per shingle regardless of how boilerplate-heavy the shingle is),
    // then one partial+final count per pair; output is |sources|² rows. --
    "source_overlap" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val toks = docs.select(col("source"), expr(toksExpr).as("ts"))
        val sg = toks.select(col("source"),
          explode(expr(
            "CASE WHEN size(ts) >= 5 THEN transform(sequence(5, size(ts)), " +
              "i -> concat_ws(' ', slice(ts, i - 4, 5))) " +
              "ELSE CAST(array() AS array<string>) END")).as("g"))
          .distinct()
        sg.alias("a").join(sg.alias("b"),
            expr("a.g = b.g AND a.source < b.source"))
          .selectExpr("a.source AS src_a", "b.source AS src_b")
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("shared_shingles"))
          .filter(col("shared_shingles") >= 2)
          .orderBy("src_a", "src_b")
      },
      s"""WITH toks AS (SELECT source, $duckToks AS ts FROM documents),
         |sg AS (SELECT DISTINCT source, unnest(list_transform(range(5, len(ts) + 1),
         |    i -> ts[i-4] || ' ' || ts[i-3] || ' ' || ts[i-2] || ' ' || ts[i-1] || ' ' || ts[i])) AS g
         |  FROM toks)
         |SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared_shingles
         |FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2 ORDER BY src_a, src_b""".stripMargin),

    // ---- corpus-wide heavy-hitter bigrams: top 20 by count with a
    // deterministic (count DESC, bigram ASC) tie-break. Partial+final
    // count then TakeOrderedAndProject — only k rows reach the driver. ---
    "ngram_top_corpus" -> QueryDef(
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(expr(toksExpr).as("ts"))
          .select(explode(expr(
            "CASE WHEN size(ts) >= 2 THEN transform(sequence(2, size(ts)), " +
              "i -> concat(ts[i-2], ' ', ts[i-1])) " +
              "ELSE CAST(array() AS array<string>) END")).as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("bigram").asc)
          .limit(20)
      },
      s"""WITH toks AS (SELECT $duckToks AS ts
        |  FROM documents),
        |bg AS (SELECT unnest(list_transform(range(2, len(ts) + 1),
        |    i -> ts[i-1] || ' ' || ts[i])) AS bigram FROM toks)
        |SELECT bigram, COUNT(*) AS cnt FROM bg GROUP BY bigram
        |ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin),

    // ---- PMI collocations (Church & Hanks 1990): bigrams ranked by
    // association lift p(xy)/(p(x)p(y)) — raw count ranking
    // (ngram_top_corpus) surfaces "of the"; lift surfaces the pairs that
    // co-occur far above chance (multiword expressions, named entities),
    // the phrase-mining signal a tokenizer/vocab pipeline consumes
    // (word2vec's phrase pass uses exactly this statistic). lift_ppm is
    // monotone in PMI (log of it), so the ranking is PMI's without any
    // transcendental in the output. Exact staged DECIMAL(38,0)/HUGEINT
    // arithmetic both engines share:
    //   lift_ppm = ((c12·N·10⁶) div (c1·c2)) · N div M
    // staged so the worst intermediate at a 100 TB corpus (N ~ 1e14
    // tokens) stays ~1e34 < 1e38 where the single-expression form
    // c12·N²·10⁶ overflows at ~1e32; the staging truncation costs at
    // most ~N/M ≈ 1 ppm, far below the min-count noise floor. Scale
    // shape: ONE tokenize pass (persisted array frame feeds pair counts,
    // unigram counts and both totals) → pair hash-group with the
    // min-count HAVING applied BEFORE any join (the pair table is the
    // only vocab²-shaped thing here and the filter prunes it to the
    // frequent head) → two vocab-keyed unigram joins by SHUFFLE (the
    // vocabulary grows with the corpus — never broadcast by design,
    // rare_token_docs' rule) → 1-row totals broadcast →
    // TakeOrderedAndProject (≤ k rows cross the final stage). ------------
    "pmi_collocations" -> QueryDef(
      (s, dir) => pmiCollocations(Tables.load(s, dir, "documents")),
      s"""WITH toks AS (SELECT $duckToks AS ts FROM documents),
        |tot AS (SELECT CAST(COALESCE(SUM(len(ts)), 0) AS HUGEINT) AS nt,
        |    CAST(COALESCE(SUM(GREATEST(len(ts) - 1, 0)), 0) AS HUGEINT) AS mt
        |  FROM toks),
        |bg AS (SELECT unnest(list_transform(range(2, len(ts) + 1),
        |    i -> ts[i-1] || ' ' || ts[i])) AS big FROM toks),
        |pairc AS (SELECT big, COUNT(*) AS c12 FROM bg GROUP BY big
        |  HAVING COUNT(*) >= 5),
        |unic AS (SELECT w, COUNT(*) AS cw
        |  FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY w),
        |sp AS (SELECT string_split(big, ' ')[1] AS w1,
        |    string_split(big, ' ')[2] AS w2, c12 FROM pairc)
        |SELECT w1, w2, c12, u1.cw AS c1, u2.cw AS c2,
        |  CAST((CAST(c12 AS HUGEINT) * nt * 1000000
        |      // (CAST(u1.cw AS HUGEINT) * u2.cw)) * nt // mt AS BIGINT)
        |    AS lift_ppm
        |FROM sp JOIN unic u1 ON sp.w1 = u1.w JOIN unic u2 ON sp.w2 = u2.w
        |CROSS JOIN tot
        |ORDER BY lift_ppm DESC, w1, w2 LIMIT 50""".stripMargin),

    // ---- content-defined chunking (the storage-dedup/CDC shape): cut
    // after every position whose rolling 16-char hash ≡ 0 (mod 64), so
    // chunk boundaries move WITH the content — an insertion early in a
    // document shifts fixed-stride chunk_text chunks (every downstream
    // hash changes) but leaves all CDC chunks after the next boundary
    // intact, which is what makes chunk-level dedup of revisioned corpora
    // work. Expected chunk ~64 chars here (demo modulus). Map-side explode
    // only, no shuffle before the presentation sort; verified per-chunk by
    // md5 exactly like chunk_text. ----------------------------------------
    "chunk_content_defined" -> QueryDef(
      (s, dir) => {
        graft.functions.HashExpressions.register(s)
        Tables.load(s, dir, "documents")
          .filter(col("n_chars") >= 1)
          .selectExpr("doc_id", "text", "length(text) AS n")
          // boundary positions from the native Rabin-Karp expression — the
          // SQL-lambda refold form (aggregate inside filter, O(n*16)
          // interpreted) measured 52 s at sf0.1 vs ~1 s native; the oracle
          // keeps the direct refold, which modular arithmetic makes
          // value-identical to the rolled hash
          .selectExpr("doc_id", "text", "n",
            "concat(array(1), transform(graft_cdc_bounds(text), i -> i + 1)) AS starts")
          .selectExpr("doc_id", "text", "n", "starts",
            "posexplode(starts) AS (k, cstart)")
          .selectExpr("doc_id", "text", "k AS chunk_idx", "cstart",
            "IF(k + 1 < size(starts), element_at(starts, k + 2) - 1, n) AS cend")
          .filter("cend >= cstart")
          .selectExpr("doc_id", "chunk_idx",
            "CAST(cend - cstart + 1 AS BIGINT) AS chunk_len",
            "md5(substring(text, cstart, cend - cstart + 1)) AS chunk_md5")
          .transform(Sorted.byNames(_, "doc_id", "chunk_idx"))
      },
      s"""WITH b AS (SELECT doc_id, text, length(text) AS n,
         |    list_prepend(1, list_transform(
         |      list_filter(range(16, length(text) + 1),
         |        i -> list_reduce(list_prepend(0::BIGINT,
         |               list_transform(range(i - 15, i + 1),
         |                 j -> ascii(substr(text, j::INT, 1))::BIGINT)),
         |               (h, c) -> (h * 31 + c) % ${graft.functions.Portable.P}) % 64 = 0),
         |      i -> i::INT + 1)) AS starts
         |  FROM documents WHERE n_chars >= 1),
         |k AS (SELECT doc_id, text, n, starts,
         |    unnest(range(1, len(starts) + 1)) AS kk FROM b),
         |c AS (SELECT doc_id, kk - 1 AS chunk_idx, starts[kk::INT] AS cstart,
         |    CASE WHEN kk < len(starts) THEN starts[kk::INT + 1] - 1 ELSE n END AS cend,
         |    text
         |  FROM k)
         |SELECT doc_id, chunk_idx,
         |  CAST(cend - cstart + 1 AS BIGINT) AS chunk_len,
         |  md5(substr(text, cstart, cend - cstart + 1)) AS chunk_md5
         |FROM c WHERE cend >= cstart
         |ORDER BY doc_id, chunk_idx""".stripMargin),

    // ---- cross-document repeated-passage report: the consumer CDC
    // chunking exists for — because boundaries are content-defined, a
    // passage repeated across documents (or document revisions) lands in
    // byte-identical chunks regardless of surrounding edits, so repeated
    // passages are found by a plain GROUP BY chunk_md5 — no pairwise
    // comparison at all. Output: chunks seen in >= 2 docs with doc and
    // occurrence counts. Scale shape: map-side chunk explode + ONE
    // combiner-friendly aggregation; output is bounded by the repeated-
    // chunk set. ----------------------------------------------------------
    "chunk_dedup" -> QueryDef(
      (s, dir) => {
        graft.functions.HashExpressions.register(s)
        Tables.load(s, dir, "documents")
          .filter(col("n_chars") >= 1)
          .selectExpr("doc_id", "text", "length(text) AS n")
          .selectExpr("doc_id", "text", "n",
            "concat(array(1), transform(graft_cdc_bounds(text), i -> i + 1)) AS starts")
          .selectExpr("doc_id", "text", "n", "starts", "posexplode(starts) AS (k, cstart)")
          .selectExpr("doc_id", "text",
            "IF(k + 1 < size(starts), element_at(starts, k + 2) - 1, n) AS cend", "cstart")
          .filter("cend >= cstart")
          .selectExpr("doc_id",
            "md5(substring(text, cstart, cend - cstart + 1)) AS chunk_md5",
            "CAST(cend - cstart + 1 AS BIGINT) AS chunk_len")
          .groupBy(col("chunk_md5"))
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_occurrences"),
            max(col("chunk_len")).as("chunk_len"))
          .filter(col("n_docs") >= 2)
          .transform(Sorted.byNames(_, "chunk_md5"))
      },
      """WITH b AS (SELECT doc_id, text, length(text) AS n,
        |    list_prepend(1, list_transform(
        |      list_filter(range(16, length(text) + 1),
        |        i -> list_reduce(list_prepend(0::BIGINT,
        |               list_transform(range(i - 15, i + 1),
        |                 j -> ascii(substr(text, j::INT, 1))::BIGINT)),
        |               (h, c) -> (h * 31 + c) % 1000000007) % 64 = 0),
        |      i -> i::INT + 1)) AS starts
        |  FROM documents WHERE n_chars >= 1),
        |k AS (SELECT doc_id, text, n, starts,
        |    unnest(range(1, len(starts) + 1)) AS kk FROM b),
        |c AS (SELECT doc_id, starts[kk::INT] AS cstart,
        |    CASE WHEN kk < len(starts) THEN starts[kk::INT + 1] - 1 ELSE n END AS cend,
        |    text FROM k),
        |ch AS (SELECT doc_id, md5(substr(text, cstart, cend - cstart + 1)) AS chunk_md5,
        |    CAST(cend - cstart + 1 AS BIGINT) AS chunk_len
        |  FROM c WHERE cend >= cstart)
        |SELECT chunk_md5, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  COUNT(*) AS n_occurrences, MAX(chunk_len) AS chunk_len
        |FROM ch GROUP BY chunk_md5 HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY chunk_md5""".stripMargin),

    // ---- Count-Min-sketch heavy hitters: terms whose SKETCH-estimated
    // count clears 0.5% of the corpus token total. Scale shape: the
    // sketch pass is a partial+final fold of the raw token-hash stream
    // into a constant 4x1024 counter matrix (graft.functions.CountMin) —
    // nothing token-sized ever shuffles for it; the only shuffle is the
    // dictionary-sized distinct over terms. The one-row sketch broadcasts
    // back onto the dictionary and the point estimate (min over 4 rows)
    // is a pure element_at expression inside codegen. The oracle rebuilds
    // the identical sketch from exact per-term counts (increment addition
    // commutes), so estimates — INCLUDING any collision overcounts — are
    // bit-identical across engines. Spark never computes exact counts:
    // the output is genuinely sketch-derived. -----------------------------
    "cms_heavy_hitters" -> QueryDef(
      (s, dir) => {
        graft.functions.HashExpressions.register(s)
        import graft.functions.CountMin
        import s.implicits._
        // persisted: the exploded term stream feeds BOTH the sketch fold and
        // the dictionary distinct — without this the corpus is scanned,
        // regex-tokenized and exploded twice per run (the dominant cost at
        // scale; same shape as boilerplate_flag's persisted shingle frame)
        val toks = Tables.load(s, dir, "documents")
          .select(explode(expr(toksExpr)).as("term"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val sketch = toks.selectExpr("graft_polyhash(term) AS h").as[Long]
          .select(new CountMin().toColumn).toDF("cms")
        val dict = toks.distinct()
          .selectExpr("term", "graft_polyhash(term) AS h")
        dict.crossJoin(broadcast(sketch))
          .withColumn("est_c", expr(CountMin.estimateSql("cms", "h")))
          .filter(expr(s"est_c * 200 >= element_at(cms, ${CountMin.Depth * CountMin.Width + 1})"))
          .select(col("term"), col("est_c"))
          .orderBy(col("est_c").desc, col("term"))
      },
      s"""WITH toks AS (SELECT unnest($duckToks) AS term FROM documents),
         |counts AS (SELECT term, COUNT(*)::BIGINT AS c FROM toks GROUP BY term),
         |hashed AS (SELECT term, c,
         |    ${graft.functions.Portable.duckPolyHashSql("term")} AS h
         |  FROM counts),
         |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM counts),
         |params(d, a, b) AS (VALUES (0, 131, 7), (1, 137, 11), (2, 139, 13), (3, 149, 17)),
         |tb AS (SELECT term, c, d, ((h * a + b) % ${graft.functions.Portable.P}) % 1024 AS bkt
         |  FROM hashed CROSS JOIN params),
         |bsum AS (SELECT d, bkt, CAST(SUM(c) AS BIGINT) AS bc FROM tb GROUP BY d, bkt),
         |est AS (SELECT t.term, MIN(b.bc) AS est_c
         |  FROM tb t JOIN bsum b USING (d, bkt) GROUP BY t.term)
         |SELECT term, est_c FROM est, n WHERE est_c * 200 >= n.n
         |ORDER BY est_c DESC, term""".stripMargin),

    // ---- overlapping chunk explode: 256-char windows, 192-char stride
    // (64 overlap) — the context-window dataloader shape. Start indices
    // 0, 192, 384, …, but a chunk is emitted ONLY while it adds content
    // beyond the previous window (start + overlap < n_chars): a doc of
    // 193–256 chars is ONE chunk, not a full chunk plus a wholly-contained
    // 64-char tail that would double-count training data. max start index
    // = (n_chars - 65) div 192 for n_chars > 256 (positive division only —
    // negative `div` truncates toward zero in Spark but floors in DuckDB).
    // The n_chars >= 1 filter guards Spark's descending-sequence pitfall.
    // Map-side explode, no shuffle; verified by per-chunk md5. -----------
    "chunk_text" -> QueryDef(
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .filter(col("n_chars") >= 1)
          .select(col("doc_id"), col("text"),
            explode(expr(
              "sequence(0, CASE WHEN n_chars <= 256 THEN 0 " +
                "ELSE CAST((n_chars - 65) div 192 AS INT) END)")).as("chunk_idx"))
          .select(col("doc_id"), col("chunk_idx"),
            expr("substring(text, chunk_idx * 192 + 1, 256)").as("chunk"))
          .select(col("doc_id"), col("chunk_idx"),
            length(col("chunk")).cast("long").as("chunk_len"),
            md5(col("chunk")).as("chunk_md5"))
          .transform(Sorted.byNames(_, "doc_id", "chunk_idx"))
      },
      """WITH idx AS (SELECT doc_id, text,
        |    unnest(range(0, CASE WHEN n_chars <= 256 THEN 1
        |      ELSE (n_chars - 65) // 192 + 1 END)) AS i
        |  FROM documents WHERE n_chars >= 1)
        |SELECT doc_id, i AS chunk_idx,
        |  CAST(length(substr(text, i * 192 + 1, 256)) AS BIGINT) AS chunk_len,
        |  md5(substr(text, i * 192 + 1, 256)) AS chunk_md5
        |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin),

    // ---- DSIR-style importance resampling: rank documents by how much
    // their token distribution resembles a TARGET slice (here lang='en')
    // relative to the full corpus — the data-selection recipe of Xie et
    // al.'s DSIR, with hashed-ngram likelihood ratios simplified to
    // per-token integer ratio weights so both engines agree bitwise
    // (w = tc*1e6 div sc is exact; the float log-likelihood sum is
    // order-dependent and engine-divergent). Scale shape: ONE tokenize +
    // explode pass persisted; both frequency tables are partial+final
    // aggs over it (vocab-sized results); weights re-enter as a
    // dictionary-sized broadcast onto the same persisted stream (swap to
    // a shuffle join on term if the vocab outgrows the broadcast
    // threshold — still dictionary-sized); per-doc score is one
    // partial+final sum; top-50 is TakeOrderedAndProject. Docs with zero
    // tokens have no token rows and drop from the ranking on both
    // engines. ------------------------------------------------------------
    "sample_importance" -> QueryDef(
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"), explode(expr(toksExpr)).as("term"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val src = toks.groupBy(col("term")).agg(count(lit(1)).as("sc"))
        val tgt = toks.filter(col("lang") === "en")
          .groupBy(col("term")).agg(count(lit(1)).as("tc"))
        val weights = src.join(tgt, Seq("term"), "left")
          .selectExpr("term", "(coalesce(tc, 0L) * 1000000L) div sc AS w")
        toks.join(broadcast(weights), "term")
          .groupBy(col("doc_id"), col("lang"))
          .agg(sum(col("w")).as("score"), count(lit(1)).as("n_toks"))
          .selectExpr("doc_id", "lang", "n_toks", "score",
            "score div n_toks AS score_per_tok")
          .orderBy(col("score_per_tok").desc, col("doc_id"))
          .limit(50)
      },
      s"""WITH toks AS (SELECT doc_id, lang, unnest($duckToks) AS term FROM documents),
         |src AS (SELECT term, COUNT(*)::BIGINT AS sc FROM toks GROUP BY term),
         |tgt AS (SELECT term, COUNT(*)::BIGINT AS tc FROM toks WHERE lang = 'en' GROUP BY term),
         |w AS (SELECT src.term, (coalesce(tc, 0) * 1000000) // sc AS w
         |  FROM src LEFT JOIN tgt USING (term)),
         |scored AS (SELECT doc_id, lang,
         |    CAST(SUM(w.w) AS BIGINT) AS score, COUNT(*) AS n_toks
         |  FROM toks JOIN w USING (term) GROUP BY doc_id, lang)
         |SELECT doc_id, lang, n_toks, score, score // n_toks AS score_per_tok
         |FROM scored ORDER BY score_per_tok DESC, doc_id LIMIT 50""".stripMargin),

    // ---- DSIR with HASHED n-gram features (Xie et al. 2023 §3.1 — the
    // paper's actual scale device): `sample_importance`'s weight table is
    // VOCAB-keyed, so it grows with the corpus; here the bigram feature
    // space is hashed into B = 8192 fixed buckets, making the importance
    // model — raw/target counts and their ratio weights — AT MOST B rows
    // at ANY corpus size, with Laplace smoothing (+1/+1) so buckets
    // unseen in the target still carry a defined weight. All arithmetic
    // is int64 and bitwise engine-identical: per-token polyhash (native
    // `graft_token_hashes`, codegen'd), bucket = ((h1*MIX + h2) % P) % B
    // (h < P ≈ 1e9, so h*MIX ≈ 2.7e18 stays in int64), weight
    // w = ((tc+1)*1e6) div (sc+1) — exact until a SINGLE bucket holds
    // ~9.2e12 target tokens, at which point B is mis-sized long before
    // the arithmetic wraps. Scale shape: ONE tokenize+hash+explode pass
    // persisted as slim (doc_id, lang, bkt) rows; both count tables are
    // partial+final aggs with ≤ B groups (combiner-perfect — every map
    // task emits ≤ B partial rows regardless of input size); the weight
    // table re-enters as a ≤ B-row BROADCAST that can never outgrow the
    // threshold (the vocab-keyed variant's documented risk); the per-doc
    // score is one partial+final sum. Docs with < 2 tokens have no
    // bigram rows and drop from the ranking in both engines. -------------
    "importance_hashed" -> QueryDef(
      (s, dir) => {
        graft.functions.HashExpressions.register(s)
        val feats = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            expr("graft_token_hashes(text)").as("th"))
          .select(col("doc_id"), col("lang"),
            explode(expr(bigramBktExpr)).as("bkt"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val src = feats.groupBy(col("bkt")).agg(count(lit(1)).as("sc"))
        val tgt = feats.filter(col("lang") === "en")
          .groupBy(col("bkt")).agg(count(lit(1)).as("tc"))
        val weights = src.join(tgt, Seq("bkt"), "left")
          .selectExpr("bkt", "((coalesce(tc, 0L) + 1L) * 1000000L) div (sc + 1L) AS w")
        feats.join(broadcast(weights), "bkt")
          .groupBy(col("doc_id"), col("lang"))
          .agg(sum(col("w")).as("score"), count(lit(1)).as("n_bigrams"))
          .selectExpr("doc_id", "lang", "n_bigrams", "score",
            "score div n_bigrams AS score_per_bigram")
          .transform(Sorted.byNames(_, "doc_id"))
      },
      s"""WITH th AS (SELECT doc_id, lang,
         |    ${graft.functions.Portable.duckHashTokensSql(duckToks)} AS th
         |  FROM documents),
         |f AS (SELECT doc_id, lang, unnest($duckBigramBkt) AS bkt FROM th),
         |src AS (SELECT bkt, COUNT(*)::BIGINT AS sc FROM f GROUP BY bkt),
         |tgt AS (SELECT bkt, COUNT(*)::BIGINT AS tc FROM f WHERE lang = 'en' GROUP BY bkt),
         |w AS (SELECT src.bkt, ((COALESCE(tc, 0) + 1) * 1000000) // (sc + 1) AS w
         |  FROM src LEFT JOIN tgt USING (bkt))
         |SELECT doc_id, lang, COUNT(*) AS n_bigrams,
         |  CAST(SUM(w.w) AS BIGINT) AS score,
         |  CAST(SUM(w.w) AS BIGINT) // COUNT(*) AS score_per_bigram
         |FROM f JOIN w USING (bkt) GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin),

    // ---- learned quality-classifier gate (the GPT-3 §A / LLaMA §2
    // classifier-filter step the heuristic gates don't cover): a
    // fastText-shaped HASHED LINEAR model — bag of hashed bigram
    // features, one weight per bucket, mean-weight score, threshold
    // keep. Training is the closed-form linear discriminant over a
    // LABELED train split (Laplace-smoothed class-conditional bucket
    // frequency difference in ppb — the sign of the mean is the same
    // decision a trained logistic model's sign gives for this feature
    // family); the fixture instantiates the standard proxy: positive =
    // the curated-language side (lang = 'en'), train = the doc_id % 2
    // half, scored = the WHOLE corpus. The model is [[trainHashedClassifier]]
    // + [[hashedClassifierScore]] so production callers bring real
    // labels (curated-corpus-vs-crawl, the published recipe) and their
    // own threshold. Scale shape: importance_hashed's exactly — the
    // weight table is EXACTLY B = 8192 rows at ANY corpus size (the
    // generated bucket domain), broadcasts, and scoring is one
    // tokenize+hash pass + a partial+final per-doc sum; training is two
    // combiner-perfect ≤ B-group counts over the train split. All int64;
    // exact until one bucket holds ~9.2e9 train bigrams (then B is
    // mis-sized long before the arithmetic wraps — source_drift's
    // caveat family). Docs with < 2 tokens have no bigram features and
    // drop from the scored frame in both engines. ------------------------
    "quality_classifier" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val w = trainHashedClassifier(
          d.filter("doc_id % 2 = 0"), posExpr = "lang = 'en'")
        hashedClassifierScore(d, w)
      },
      s"""WITH th AS (SELECT doc_id, lang,
         |    ${graft.functions.Portable.duckHashTokensSql(duckToks)} AS th
         |  FROM documents),
         |f AS (SELECT doc_id, lang, unnest($duckBigramBkt) AS bkt FROM th),
         |tr AS (SELECT lang, bkt FROM f WHERE doc_id % 2 = 0),
         |pos AS (SELECT bkt, COUNT(*)::BIGINT AS pc FROM tr WHERE lang = 'en' GROUP BY bkt),
         |neg AS (SELECT bkt, COUNT(*)::BIGINT AS nc FROM tr WHERE NOT (lang = 'en') GROUP BY bkt),
         |pt AS (SELECT COALESCE((SELECT SUM(pc) FROM pos), 0)::BIGINT AS ptot),
         |nt AS (SELECT COALESCE((SELECT SUM(nc) FROM neg), 0)::BIGINT AS ntot),
         |dom AS (SELECT UNNEST(range(0, 8192)) AS bkt),
         |w AS (SELECT dom.bkt,
         |    ((COALESCE(pc, 0) + 1) * 1000000000) // (ptot + 8192)
         |      - ((COALESCE(nc, 0) + 1) * 1000000000) // (ntot + 8192) AS w
         |  FROM dom CROSS JOIN pt CROSS JOIN nt
         |  LEFT JOIN pos ON pos.bkt = dom.bkt
         |  LEFT JOIN neg ON neg.bkt = dom.bkt)
         |SELECT doc_id, lang, COUNT(*) AS n_bigrams,
         |  CAST(SUM(w.w) AS BIGINT) // COUNT(*) AS score_ppb,
         |  CASE WHEN CAST(SUM(w.w) AS BIGINT) // COUNT(*) > 0 THEN 1 ELSE 0 END AS keep
         |FROM f JOIN w USING (bkt) GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin),

    // ---- corpus data card: the per-(source, lang) composition report a
    // curation run publishes beside the released dataset (doc/token/char
    // totals, length extremes, integer mean) with per-source subtotals
    // and a grand total — the "datasheet" aggregation every release
    // pipeline runs last. ONE corpus-linear pass: tokenize map-side
    // (codegen'd split+filter; only size() crosses the agg boundary, the
    // token array itself is never shuffled), then a single partial+final
    // ROLLUP agg — the result is |source × lang| + |source| + 1 rows at
    // any corpus size. Rollup nulls fold to the '__all__' sentinel and
    // the grouping LEVEL disambiguates them from any real value, so the
    // frame is deterministic and oracle-hashable even if a raw source or
    // lang value were itself null. ---------------------------------------
    "corpus_stats" -> QueryDef(
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("source"), col("lang"), col("n_chars"),
            expr(s"size($toksExpr)").cast("long").as("n_tokens"))
          .rollup(col("source"), col("lang"))
          .agg(
            (grouping(col("source")) * 2 + grouping(col("lang"))).cast("int").as("lvl"),
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("tot_tokens"),
            sum(col("n_chars")).as("tot_chars"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .select(col("lvl"),
            coalesce(col("source"), lit("__all__")).as("src"),
            coalesce(col("lang"), lit("__all__")).as("lng"),
            col("n_docs"), col("tot_tokens"), col("tot_chars"),
            col("min_chars"), col("max_chars"),
            expr("tot_chars div n_docs").as("avg_chars"))
          .transform(Sorted.byNames(_, "lvl", "src", "lng"))
      },
      // CAST(SUM(...) AS BIGINT): DuckDB's SUM(BIGINT) is HUGEINT (the
      // pack_sequences Arrow-type note); GROUPING() likewise widens
      s"""WITH d AS (SELECT source, lang, n_chars,
         |    CAST(len($duckToks) AS BIGINT) AS n_tokens FROM documents)
         |SELECT CAST(GROUPING(source) * 2 + GROUPING(lang) AS INT) AS lvl,
         |  COALESCE(source, '__all__') AS src, COALESCE(lang, '__all__') AS lng,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
         |  CAST(SUM(n_chars) AS BIGINT) AS tot_chars,
         |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
         |  CAST(SUM(n_chars) AS BIGINT) // COUNT(*) AS avg_chars
         |FROM d GROUP BY ROLLUP (source, lang) ORDER BY lvl, src, lng""".stripMargin),

    // ---- CCNet bucketing over the LEARNED score — the composition the
    // two round-10 lifts exist for: Wenzek et al.'s actual design
    // buckets by a trained LM's quality signal, not a heuristic, so this
    // entry feeds hashedClassifierScore's per-doc score_ppb (trained on
    // the doc_id % 2 half, scored over the whole corpus) into
    // `TextOps.ccnetBuckets(scored, scoreCol)` unchanged. Head = the
    // per-language third the classifier rates best — the "train on the
    // head" frame. Scale shape: the classifier pass is corpus-linear
    // with the ≤ B broadcast (quality_classifier's shape) and the
    // bucketing adds only the distribution-window + broadcast cutoffs
    // (ccnet_buckets' shape) — no new corpus-volume stage appears in
    // the composition. ---------------------------------------------------
    "classifier_buckets" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val w = trainHashedClassifier(
          d.filter("doc_id % 2 = 0"), posExpr = "lang = 'en'")
        TextOps.ccnetBuckets(
          hashedClassifierScore(d, w), scoreCol = "score_ppb")
      },
      s"""WITH th AS (SELECT doc_id, lang,
         |    ${graft.functions.Portable.duckHashTokensSql(duckToks)} AS th
         |  FROM documents),
         |f AS (SELECT doc_id, lang, unnest($duckBigramBkt) AS bkt FROM th),
         |tr AS (SELECT lang, bkt FROM f WHERE doc_id % 2 = 0),
         |pos AS (SELECT bkt, COUNT(*)::BIGINT AS pc FROM tr WHERE lang = 'en' GROUP BY bkt),
         |neg AS (SELECT bkt, COUNT(*)::BIGINT AS nc FROM tr WHERE NOT (lang = 'en') GROUP BY bkt),
         |pt AS (SELECT COALESCE((SELECT SUM(pc) FROM pos), 0)::BIGINT AS ptot),
         |nt AS (SELECT COALESCE((SELECT SUM(nc) FROM neg), 0)::BIGINT AS ntot),
         |dom AS (SELECT UNNEST(range(0, 8192)) AS bkt),
         |w AS (SELECT dom.bkt,
         |    ((COALESCE(pc, 0) + 1) * 1000000000) // (ptot + 8192)
         |      - ((COALESCE(nc, 0) + 1) * 1000000000) // (ntot + 8192) AS w
         |  FROM dom CROSS JOIN pt CROSS JOIN nt
         |  LEFT JOIN pos ON pos.bkt = dom.bkt
         |  LEFT JOIN neg ON neg.bkt = dom.bkt),
         |scores AS (SELECT doc_id, lang,
         |    CAST(SUM(w.w) AS BIGINT) // COUNT(*) AS score_ppb
         |  FROM f JOIN w USING (bkt) GROUP BY doc_id, lang),
         |dist AS (SELECT lang, score_ppb, COUNT(*) AS c FROM scores GROUP BY lang, score_ppb),
         |nl AS (SELECT lang, COUNT(*) AS n FROM scores GROUP BY lang),
         |cw AS (SELECT lang, score_ppb, SUM(c) OVER (PARTITION BY lang ORDER BY score_ppb DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM dist),
         |cut AS (SELECT cw.lang, MAX(CASE WHEN cum >= (n + 2) // 3 THEN score_ppb END) AS c2,
         |    MAX(CASE WHEN cum >= (2 * n + 2) // 3 THEN score_ppb END) AS c1
         |  FROM cw JOIN nl USING (lang) GROUP BY cw.lang)
         |SELECT s.doc_id, s.lang, s.score_ppb,
         |  CASE WHEN s.score_ppb >= c2 THEN 'head'
         |       WHEN s.score_ppb >= c1 THEN 'middle' ELSE 'tail' END AS bucket
         |FROM scores s JOIN cut USING (lang) ORDER BY s.doc_id""".stripMargin),

    // ---- classifier evaluation on the HELD-OUT half: the confusion
    // matrix + integer per-mille precision/recall/accuracy for
    // quality_classifier's gate, computed strictly on the doc_id % 2 = 1
    // docs the train pass never saw — the train/test separation a
    // production gate report requires (in-sample numbers overstate a
    // memorizing model; the split here is the same % 2 rule the trainer
    // uses, complemented). One extra corpus pass over the held-out half
    // into a SINGLE row; all arithmetic int64 with zero-denominator
    // guards, so a degenerate split (no positives) reads 0, not a crash.
    // ---- label-noise detection (Northcutt et al. 2021, "Confident
    // Learning" — the data-cleaning step that finds MISLABELED examples
    // instead of low-quality ones): an example counts as confidently
    // class-j when its score clears class j's self-confidence threshold
    // t_j = the mean score of examples LABELED j (the paper's per-class
    // mean-predicted-probability threshold, with the hashed classifier's
    // score_ppb as the probability surrogate — higher = more positive);
    // a SUSPECT is a label contradicting a confident prediction (labeled
    // positive yet confidently negative, or vice versa) — the
    // off-diagonal of the confident joint. Scored strictly on the
    // held-out half (classifier_eval's train/test discipline: in-sample
    // confidence flags nothing on a memorizing model). Exact integers:
    // thresholds are trunc-toward-zero means; a single-class frame
    // yields a NULL missing-class threshold whose comparisons fall to
    // the 0 branch in both engines — no suspects, never an error.
    // Output per held-out doc (flags, not a filtered frame, so the
    // result is deterministic-size); scale shape: one scoring pass, a
    // 2-row threshold fold broadcast back, flags map-side. ---------------
    "label_noise_detect" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val w = trainHashedClassifier(
          d.filter("doc_id % 2 = 0"), posExpr = "lang = 'en'")
        labelNoiseDetect(
          hashedClassifierScore(d.filter("doc_id % 2 = 1"), w),
          labelExpr = "lang = 'en'")
      },
      s"""WITH th AS (SELECT doc_id, lang,
         |    ${graft.functions.Portable.duckHashTokensSql(duckToks)} AS th
         |  FROM documents),
         |f AS (SELECT doc_id, lang, unnest($duckBigramBkt) AS bkt FROM th),
         |tr AS (SELECT lang, bkt FROM f WHERE doc_id % 2 = 0),
         |pos AS (SELECT bkt, COUNT(*)::BIGINT AS pc FROM tr WHERE lang = 'en' GROUP BY bkt),
         |neg AS (SELECT bkt, COUNT(*)::BIGINT AS nc FROM tr WHERE NOT (lang = 'en') GROUP BY bkt),
         |pt AS (SELECT COALESCE((SELECT SUM(pc) FROM pos), 0)::BIGINT AS ptot),
         |nt AS (SELECT COALESCE((SELECT SUM(nc) FROM neg), 0)::BIGINT AS ntot),
         |dom AS (SELECT UNNEST(range(0, 8192)) AS bkt),
         |w AS (SELECT dom.bkt,
         |    ((COALESCE(pc, 0) + 1) * 1000000000) // (ptot + 8192)
         |      - ((COALESCE(nc, 0) + 1) * 1000000000) // (ntot + 8192) AS w
         |  FROM dom CROSS JOIN pt CROSS JOIN nt
         |  LEFT JOIN pos ON pos.bkt = dom.bkt
         |  LEFT JOIN neg ON neg.bkt = dom.bkt),
         |scored AS (SELECT doc_id, lang,
         |    CAST(SUM(w.w) AS BIGINT) // COUNT(*) AS score_ppb
         |  FROM f JOIN w USING (bkt) WHERE doc_id % 2 = 1 GROUP BY doc_id, lang),
         |lab AS (SELECT doc_id, score_ppb,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label FROM scored),
         |cut AS (SELECT MAX(CASE WHEN label = 1 THEN t END) AS t1,
         |    MAX(CASE WHEN label = 0 THEN t END) AS t0
         |  FROM (SELECT label, CAST(SUM(score_ppb) AS BIGINT) // COUNT(*) AS t
         |        FROM lab GROUP BY label))
         |SELECT doc_id, label, score_ppb,
         |  CASE WHEN score_ppb >= t1 THEN 1 ELSE 0 END AS conf_pos,
         |  CASE WHEN score_ppb <= t0 THEN 1 ELSE 0 END AS conf_neg,
         |  CASE WHEN label = 1 AND score_ppb <= t0 THEN 1
         |       WHEN label = 0 AND score_ppb >= t1 THEN 1
         |       ELSE 0 END AS suspect
         |FROM lab CROSS JOIN cut ORDER BY doc_id""".stripMargin),

    "classifier_eval" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val w = trainHashedClassifier(
          d.filter("doc_id % 2 = 0"), posExpr = "lang = 'en'")
        classifierEval(
          hashedClassifierScore(d.filter("doc_id % 2 = 1"), w),
          labelExpr = "lang = 'en'")
      },
      s"""WITH th AS (SELECT doc_id, lang,
         |    ${graft.functions.Portable.duckHashTokensSql(duckToks)} AS th
         |  FROM documents),
         |f AS (SELECT doc_id, lang, unnest($duckBigramBkt) AS bkt FROM th),
         |tr AS (SELECT lang, bkt FROM f WHERE doc_id % 2 = 0),
         |pos AS (SELECT bkt, COUNT(*)::BIGINT AS pc FROM tr WHERE lang = 'en' GROUP BY bkt),
         |neg AS (SELECT bkt, COUNT(*)::BIGINT AS nc FROM tr WHERE NOT (lang = 'en') GROUP BY bkt),
         |pt AS (SELECT COALESCE((SELECT SUM(pc) FROM pos), 0)::BIGINT AS ptot),
         |nt AS (SELECT COALESCE((SELECT SUM(nc) FROM neg), 0)::BIGINT AS ntot),
         |dom AS (SELECT UNNEST(range(0, 8192)) AS bkt),
         |w AS (SELECT dom.bkt,
         |    ((COALESCE(pc, 0) + 1) * 1000000000) // (ptot + 8192)
         |      - ((COALESCE(nc, 0) + 1) * 1000000000) // (ntot + 8192) AS w
         |  FROM dom CROSS JOIN pt CROSS JOIN nt
         |  LEFT JOIN pos ON pos.bkt = dom.bkt
         |  LEFT JOIN neg ON neg.bkt = dom.bkt),
         |sc AS (SELECT doc_id, lang,
         |    CASE WHEN CAST(SUM(w.w) AS BIGINT) // COUNT(*) > 0 THEN 1 ELSE 0 END AS keep
         |  FROM f JOIN w USING (bkt) WHERE doc_id % 2 = 1 GROUP BY doc_id, lang),
         |cm AS (SELECT
         |    CAST(SUM(CASE WHEN lang = 'en' AND keep = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(SUM(CASE WHEN lang != 'en' AND keep = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(SUM(CASE WHEN lang = 'en' AND keep = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(SUM(CASE WHEN lang != 'en' AND keep = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM sc)
         |SELECT tp + fp + fn + tn AS n, tp, fp, fn, tn,
         |  CASE WHEN tp + fp = 0 THEN 0 ELSE tp * 1000 // (tp + fp) END AS precision_pm,
         |  CASE WHEN tp + fn = 0 THEN 0 ELSE tp * 1000 // (tp + fn) END AS recall_pm,
         |  CASE WHEN tp + fp + fn + tn = 0 THEN 0
         |       ELSE (tp + tn) * 1000 // (tp + fp + fn + tn) END AS accuracy_pm
         |FROM cm""".stripMargin),

    // ---- threshold-free AUC of the learned classifier ----------------------
    // classifier_eval reads the confusion matrix AT one threshold; AUC
    // reads the whole ranking (Fawcett 2006): the probability a random
    // positive outscores a random negative, ties at half credit — the
    // number that tells you whether a bad precision row means a bad
    // MODEL or a bad THRESHOLD. Exact integers via the Mann–Whitney
    // rank-sum closed form with doubled midranks (2·mid = 2·cum_prev +
    // cnt + 1 — integer by construction); the per-score distribution is
    // the only corpus-volume fold and the ONE rank window runs over that
    // distribution, never corpus rows (the ccnet_buckets shape and its
    // documented coarsen-the-quantization knob); the final fold is one
    // row. Same held-out fixture as classifier_eval: train on doc_id%2=0,
    // rank the held-out half. Division parity: both engines truncate
    // integer division toward zero (verified: DuckDB -7//2 = -3), so the
    // negative per-doc mean scores need no sign decomposition. ---------------
    "classifier_auc" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val w = trainHashedClassifier(
          d.filter("doc_id % 2 = 0"), posExpr = "lang = 'en'")
        classifierAuc(
          hashedClassifierScore(d.filter("doc_id % 2 = 1"), w),
          labelExpr = "lang = 'en'")
      },
      s"""WITH th AS (SELECT doc_id, lang,
         |    ${graft.functions.Portable.duckHashTokensSql(duckToks)} AS th
         |  FROM documents),
         |f AS (SELECT doc_id, lang, unnest($duckBigramBkt) AS bkt FROM th),
         |tr AS (SELECT lang, bkt FROM f WHERE doc_id % 2 = 0),
         |pos AS (SELECT bkt, COUNT(*)::BIGINT AS pc FROM tr WHERE lang = 'en' GROUP BY bkt),
         |neg AS (SELECT bkt, COUNT(*)::BIGINT AS nc FROM tr WHERE NOT (lang = 'en') GROUP BY bkt),
         |pt AS (SELECT COALESCE((SELECT SUM(pc) FROM pos), 0)::BIGINT AS ptot),
         |nt AS (SELECT COALESCE((SELECT SUM(nc) FROM neg), 0)::BIGINT AS ntot),
         |dom AS (SELECT UNNEST(range(0, 8192)) AS bkt),
         |w AS (SELECT dom.bkt,
         |    ((COALESCE(pc, 0) + 1) * 1000000000) // (ptot + 8192)
         |      - ((COALESCE(nc, 0) + 1) * 1000000000) // (ntot + 8192) AS w
         |  FROM dom CROSS JOIN pt CROSS JOIN nt
         |  LEFT JOIN pos ON pos.bkt = dom.bkt
         |  LEFT JOIN neg ON neg.bkt = dom.bkt),
         |sc AS (SELECT doc_id, CAST(lang = 'en' AS BIGINT) AS y,
         |    CAST(SUM(w.w) AS BIGINT) // COUNT(*) AS s
         |  FROM f JOIN w USING (bkt) WHERE doc_id % 2 = 1 GROUP BY doc_id, lang),
         |g AS (SELECT s, COUNT(*)::BIGINT AS cnt, SUM(y)::BIGINT AS pos
         |  FROM sc GROUP BY s),
         |c AS (SELECT s, cnt, pos,
         |    COALESCE(SUM(cnt) OVER (ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cp
         |  FROM g),
         |t AS (SELECT SUM(pos::HUGEINT * (2 * cp + cnt + 1)) AS s2,
         |    COALESCE(SUM(pos), 0)::BIGINT AS np,
         |    COALESCE(SUM(cnt), 0)::BIGINT AS n FROM c),
         |a AS (SELECT n, np AS n_pos, n - np AS n_neg,
         |    CASE WHEN np = 0 OR n - np = 0 THEN 0
         |         ELSE CAST((s2 - np::HUGEINT * (np + 1)) * 1000000
         |              // (2 * np::HUGEINT * (n - np)) AS BIGINT) END AS auc_ppm
         |  FROM t)
         |SELECT n, n_pos, n_neg, auc_ppm, 2 * auc_ppm - 1000000 AS gini_ppm
         |FROM a""".stripMargin),

    // ---- decile gains/lift table of the learned classifier -----------------
    // The targeting read beside classifier_auc's single ranking number:
    // "score the corpus, keep the top decile" is THE production use of a
    // quality classifier, and the gains table is what justifies the
    // cutoff — per score-decile volume, positive rate, lift over the
    // base rate, cumulative capture (the marketing gains curve, equally
    // the curation yield curve). Deciles from the per-score DISTRIBUTION
    // cumulative (the ccnet/rfm cutoff trick); a tie group takes the
    // decile of its first descending rank so equal scores never split
    // (the rfm rule). One corpus-volume fold; everything after runs over
    // the distribution then the <= buckets-row frame. Same held-out
    // fixture as classifier_eval/classifier_auc. --------------------------
    "classifier_lift" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val w = trainHashedClassifier(
          d.filter("doc_id % 2 = 0"), posExpr = "lang = 'en'")
        classifierLift(
          hashedClassifierScore(d.filter("doc_id % 2 = 1"), w),
          labelExpr = "lang = 'en'")
      },
      s"""WITH th AS (SELECT doc_id, lang,
         |    ${graft.functions.Portable.duckHashTokensSql(duckToks)} AS th
         |  FROM documents),
         |f AS (SELECT doc_id, lang, unnest($duckBigramBkt) AS bkt FROM th),
         |tr AS (SELECT lang, bkt FROM f WHERE doc_id % 2 = 0),
         |pos AS (SELECT bkt, COUNT(*)::BIGINT AS pc FROM tr WHERE lang = 'en' GROUP BY bkt),
         |neg AS (SELECT bkt, COUNT(*)::BIGINT AS nc FROM tr WHERE NOT (lang = 'en') GROUP BY bkt),
         |pt AS (SELECT COALESCE((SELECT SUM(pc) FROM pos), 0)::BIGINT AS ptot),
         |nt AS (SELECT COALESCE((SELECT SUM(nc) FROM neg), 0)::BIGINT AS ntot),
         |dom AS (SELECT UNNEST(range(0, 8192)) AS bkt),
         |w AS (SELECT dom.bkt,
         |    ((COALESCE(pc, 0) + 1) * 1000000000) // (ptot + 8192)
         |      - ((COALESCE(nc, 0) + 1) * 1000000000) // (ntot + 8192) AS w
         |  FROM dom CROSS JOIN pt CROSS JOIN nt
         |  LEFT JOIN pos ON pos.bkt = dom.bkt
         |  LEFT JOIN neg ON neg.bkt = dom.bkt),
         |sc AS (SELECT doc_id, CAST(lang = 'en' AS BIGINT) AS y,
         |    CAST(SUM(w.w) AS BIGINT) // COUNT(*) AS s
         |  FROM f JOIN w USING (bkt) WHERE doc_id % 2 = 1 GROUP BY doc_id, lang),
         |g AS (SELECT s, COUNT(*)::BIGINT AS cnt, SUM(y)::BIGINT AS pos
         |  FROM sc GROUP BY s),
         |c AS (SELECT s, cnt, pos,
         |    (SELECT SUM(cnt) FROM g)::BIGINT AS tot,
         |    (SELECT SUM(pos) FROM g)::BIGINT AS ptot,
         |    COALESCE(SUM(cnt) OVER (ORDER BY s DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cp
         |  FROM g),
         |dd AS (SELECT CAST(cp::HUGEINT * 10 // tot + 1 AS BIGINT) AS decile,
         |    cnt, pos, tot, ptot FROM c),
         |pd AS (SELECT decile, tot, ptot, SUM(cnt)::BIGINT AS n_d,
         |    SUM(pos)::BIGINT AS pos_d FROM dd GROUP BY 1, 2, 3),
         |fl AS (SELECT decile, n_d, pos_d, tot, ptot,
         |    SUM(pos_d) OVER (ORDER BY decile
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_pos
         |  FROM pd)
         |SELECT decile, n_d AS n, pos_d AS n_pos,
         |  pos_d * 1000 // n_d AS rate_pm,
         |  CASE WHEN ptot = 0 THEN 0
         |       ELSE CAST(pos_d::HUGEINT * tot * 1000
         |            // (n_d::HUGEINT * ptot) AS BIGINT) END AS lift_milli,
         |  CASE WHEN ptot = 0 THEN 0
         |       ELSE cum_pos * 1000 // ptot END AS cum_capture_pm
         |FROM fl ORDER BY decile""".stripMargin),

    // ---- chi-square feature screen over the hashed bigram space -----------
    // WHICH features drive the classifier? The model-diagnostics read
    // beside quality_classifier/classifier_eval (and the classic
    // feature-selection step — Yang & Pedersen 1997 rank chi² among the
    // strongest text-feature screens): every bucket of the B = 8192
    // hashed space is a 2×2 test — occurrences in the positive class vs
    // the negative class against the shared class margins — scored by
    // the SAME staged-integer chi-square as ab_test_chi2 /
    // StreamingAbMonitor (EventOps.chi2Readout, keyCols-generalized: one
    // definition, a fourth consumer). Scale shape: one tokenize+hash
    // pass into a combiner-perfect ≤ B-group count, margins = one more
    // fold broadcast back, the 2×2 arithmetic map-side over ≤ B rows,
    // TakeOrderedAndProject bounds the tail (chi2 DESC, bkt ASC
    // tie-break). Same N ≤ 2e9 headroom as the A/B readout. ----------------
    "feature_chi2" -> QueryDef(
      (s, dir) => featureChi2(
        Tables.load(s, dir, "documents").filter("doc_id % 2 = 0"),
        posExpr = "lang = 'en'"),
      s"""WITH th AS (SELECT doc_id, lang,
         |    ${graft.functions.Portable.duckHashTokensSql(duckToks)} AS th
         |  FROM documents WHERE doc_id % 2 = 0),
         |f AS (SELECT lang, unnest($duckBigramBkt) AS bkt FROM th),
         |l AS (SELECT bkt, CAST(lang = 'en' AS INT) AS pos FROM f),
         |bc AS (SELECT bkt, SUM(pos)::BIGINT AS conv_a,
         |    SUM(1 - pos)::BIGINT AS conv_b FROM l GROUP BY bkt),
         |t AS (SELECT SUM(pos)::BIGINT AS n_a, SUM(1 - pos)::BIGINT AS n_b FROM l),
         |c AS (SELECT bkt, n_a, conv_a, n_b, conv_b,
         |    conv_a::HUGEINT * (n_b - conv_b) - conv_b::HUGEINT * (n_a - conv_a) AS dd
         |  FROM bc CROSS JOIN t),
         |x AS (SELECT bkt, conv_a, conv_b,
         |    CASE WHEN n_a = 0 OR n_b = 0 OR conv_a + conv_b = 0
         |           OR n_a - conv_a + n_b - conv_b = 0 THEN 0
         |      ELSE ((dd * dd // (n_a::HUGEINT * n_b)) * 1000 * (n_a + n_b))
         |        // ((conv_a + conv_b)::HUGEINT * (n_a - conv_a + n_b - conv_b))
         |    END AS chi2_milli
         |  FROM c)
         |SELECT bkt, conv_a AS pos_count, conv_b AS neg_count,
         |  chi2_milli::BIGINT AS chi2_milli,
         |  CAST(chi2_milli >= 3841 AS INT) AS significant
         |FROM x ORDER BY chi2_milli DESC, bkt LIMIT 50""".stripMargin),

    // ---- release-to-release corpus snapshot diff: which documents were
    // added, removed, changed, or untouched between two corpus versions,
    // decided by CONTENT DIGEST (the one content-identity rule the dedup
    // family shares) — the report a curation pipeline publishes beside
    // each release, and the input to incremental re-processing (only
    // added/changed docs re-enter the gate stack; see dedup_incremental
    // for the dedup analog). The fixture constructs the two versions
    // deterministically from `documents`: v1 drops doc_id % 7 = 0, v2
    // drops doc_id % 5 = 0 and revises the text of doc_id % 11 = 0 — so
    // every status value occurs. Scale shape: digests map-side on both
    // scans, ONE full-outer equi-shuffle on doc_id (never two anti-joins
    // + an inner join: that is three shuffles of the same frames for one
    // result), null-safe digest compare; at 100 TB bucket BOTH snapshot
    // tables by doc_id (sources/Bucketing.scala) and the join is
    // zero-shuffle. ------------------------------------------------------
    "snapshot_diff" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val v1 = d.filter("doc_id % 7 != 0")
        val v2 = d.filter("doc_id % 5 != 0")
          .withColumn("text", expr("IF(doc_id % 11 = 0, concat(text, ' rev2'), text)"))
        snapshotDiff(v1, v2)
      },
      s"""WITH v1 AS (SELECT doc_id, source, md5(text) AS d1, 1 AS p1
         |  FROM documents WHERE doc_id % 7 != 0),
         |v2 AS (SELECT doc_id, source,
         |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' rev2' ELSE text END) AS d2,
         |    1 AS p2
         |  FROM documents WHERE doc_id % 5 != 0)
         |SELECT doc_id, COALESCE(v2.source, v1.source) AS source,
         |  CASE WHEN p1 IS NULL THEN 'added'
         |       WHEN p2 IS NULL THEN 'removed'
         |       WHEN d1 IS NOT DISTINCT FROM d2 THEN 'unchanged'
         |       ELSE 'changed' END AS status
         |FROM v1 FULL JOIN v2 USING (doc_id) ORDER BY doc_id""".stripMargin),

    // ---- distribution-drift monitor: exact total-variation distance
    // between each source's hashed-bigram distribution and the REST of the
    // corpus — the check a pipeline runs before mixing a new crawl
    // snapshot / source into the training pool (and the natural companion
    // to importance_hashed: same B = 8192 fixed feature space). TVD
    // = ½ Σ_b |p_s(b) − p_rest(b)| with both fractions as parts-per-1e9
    // integer floor-divisions, so the statistic is bitwise
    // engine-identical (exact while a source holds < 9.2e9 bigrams — past
    // that, drop SCALE a decade; no transcendentals anywhere). Scale
    // shape: the ONLY corpus-linear work is one tokenize+hash pass into a
    // combiner-perfect (source, bkt) count (≤ |sources|·B groups — every
    // map task emits ≤ that many partial rows); everything downstream
    // operates on model-sized frames: per-source totals (|sources| rows),
    // per-bucket totals (≤ B rows, broadcast), the 1-row grand total, and
    // the |sources|×B grid that scores absent-bucket mass too. Sources
    // with zero bigrams have no distribution and drop in both engines; a
    // single-source corpus has no rest and yields an empty frame
    // (n_r > 0 guard). ---------------------------------------------------
    "source_drift" -> QueryDef(
      (s, dir) => {
        graft.functions.HashExpressions.register(s)
        val sb = Tables.load(s, dir, "documents")
          .select(col("source"), expr("graft_token_hashes(text)").as("th"))
          .select(col("source"), explode(expr(bigramBktExpr)).as("bkt"))
          .groupBy(col("source"), col("bkt")).agg(count(lit(1)).as("o"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val totals = sb.groupBy(col("source")).agg(sum(col("o")).as("n_s"))
        val bt = sb.groupBy(col("bkt")).agg(sum(col("o")).as("c_b"))
        val grand = sb.agg(sum(col("o")).as("n"))
        totals.crossJoin(broadcast(bt)).crossJoin(broadcast(grand))
          .join(sb, Seq("source", "bkt"), "left")
          .filter(col("n") - col("n_s") > 0)
          .selectExpr("source", "n_s", "n - n_s AS n_r",
            "abs((coalesce(o, 0L) * 1000000000L) div n_s - " +
              "((c_b - coalesce(o, 0L)) * 1000000000L) div (n - n_s)) AS d")
          .groupBy(col("source"), col("n_s"), col("n_r"))
          .agg(sum(col("d")).as("sd"))
          .selectExpr("source", "n_s AS n_tokens", "n_r AS rest_tokens",
            "sd div 2 AS tvd_ppb")
          .transform(Sorted.byNames(_, "source"))
      },
      s"""WITH th AS (SELECT source,
         |    ${graft.functions.Portable.duckHashTokensSql(duckToks)} AS th
         |  FROM documents),
         |f AS (SELECT source, unnest($duckBigramBkt) AS bkt FROM th),
         |sb AS (SELECT source, bkt, COUNT(*)::BIGINT AS o FROM f GROUP BY source, bkt),
         |t AS (SELECT source, CAST(SUM(o) AS BIGINT) AS n_s FROM sb GROUP BY source),
         |bt AS (SELECT bkt, CAST(SUM(o) AS BIGINT) AS c_b FROM sb GROUP BY bkt),
         |g AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM sb),
         |d AS (SELECT t.source, t.n_s, g.n - t.n_s AS n_r,
         |    ABS((COALESCE(o, 0) * 1000000000) // t.n_s -
         |        ((bt.c_b - COALESCE(o, 0)) * 1000000000) // (g.n - t.n_s)) AS d
         |  FROM t CROSS JOIN bt CROSS JOIN g
         |  LEFT JOIN sb ON sb.source = t.source AND sb.bkt = bt.bkt
         |  WHERE g.n - t.n_s > 0)
         |SELECT source, n_s AS n_tokens, n_r AS rest_tokens,
         |  CAST(SUM(d) AS BIGINT) // 2 AS tvd_ppb
         |FROM d GROUP BY source, n_s, n_r ORDER BY source""".stripMargin),

    // ---- corpus diversity report: per-source distinct-n ratios
    // (distinct n-grams / total n-grams, n ∈ {1,2,3}, parts-per-million)
    // — the distinct-n diversity statistic (Li et al. 2016) a data card
    // publishes per source: templated/boilerplate-heavy sources read low
    // (few distinct n-grams repeated many times), organic text reads
    // high, and a release-over-release DROP in distinct-2/3 is the
    // canonical "a generator is flooding this source" alarm. N-gram
    // identity is the PAIRED 60-bit fingerprint (two independent modular
    // chains, Portable.P2/MIX2): a single mod-P chain is a ~2^30 space
    // that saturates at a 100 TB census (birthday undercount ~d²/2P —
    // 5% wrong at 1e8 distinct); the pair keeps the undercount below
    // 1e-6 at 1e9 distinct for one extra int64 expression. See
    // [[corpusDiversity]] for the scale shape. -------------------------
    "corpus_diversity" -> QueryDef(
      (s, dir) => corpusDiversity(Tables.load(s, dir, "documents")), {
        import graft.functions.Portable.{MIX, MIX2, P, P2}
        s"""WITH th AS (SELECT source,
           |    ${graft.functions.Portable.duckHashTokensSql(duckToks)} AS th
           |  FROM documents),
           |f AS (
           |  SELECT source, 1 AS n,
           |    unnest(list_transform(th, x -> x * 2147483648 + (x * $MIX2) % $P2)) AS fp
           |  FROM th
           |  UNION ALL
           |  SELECT source, 2 AS n,
           |    unnest(CASE WHEN len(th) >= 2 THEN list_transform(range(2, len(th) + 1),
           |      i -> ((th[i-1] * $MIX + th[i]) % $P) * 2147483648
           |         + (th[i-1] * $MIX2 + th[i]) % $P2)
           |      ELSE CAST([] AS BIGINT[]) END) AS fp
           |  FROM th
           |  UNION ALL
           |  SELECT source, 3 AS n,
           |    unnest(CASE WHEN len(th) >= 3 THEN list_transform(range(3, len(th) + 1),
           |      i -> ((((th[i-2] * $MIX + th[i-1]) % $P) * $MIX + th[i]) % $P) * 2147483648
           |         + (((th[i-2] * $MIX2 + th[i-1]) % $P2) * $MIX2 + th[i]) % $P2)
           |      ELSE CAST([] AS BIGINT[]) END) AS fp
           |  FROM th)
           |SELECT source, n, COUNT(*)::BIGINT AS total_ngrams,
           |  COUNT(DISTINCT fp)::BIGINT AS distinct_ngrams,
           |  COUNT(DISTINCT fp)::BIGINT * 1000000 // COUNT(*)::BIGINT AS distinct_ppm
           |FROM f GROUP BY source, n ORDER BY source, n""".stripMargin
      }),

    // ---- rare-vocabulary density per document: the long-tail mining
    // signal — rare_pm high on genuinely specialized content (the docs a
    // curation pipeline UP-samples for coverage: technical vocabulary,
    // named entities, low-resource domains) and EXTREME on OCR garbage /
    // mojibake (the same census doubles as a quality gate at the far
    // tail). df counts DOCUMENTS containing the token (distinct per
    // doc), rare = df <= rareDf. Scale shape: one tokenize pass ->
    // distinct (doc_id, tok) hash-group (persisted — feeds the df
    // census AND the scoring join), vocab-keyed df table joins back by
    // SHUFFLE (the vocabulary tail grows with the corpus — never
    // broadcast by design), then one partial+final per-doc fold. ----------
    "rare_token_docs" -> QueryDef(
      (s, dir) => rareTokenDocs(Tables.load(s, dir, "documents")),
      s"""WITH dt AS (SELECT DISTINCT doc_id, unnest($duckToks) AS tok
         |  FROM documents),
         |df AS (SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok),
         |j AS (SELECT doc_id, CAST(df <= 2 AS INT) AS is_rare
         |  FROM dt JOIN df USING (tok))
         |SELECT doc_id, COUNT(*)::BIGINT AS n_distinct,
         |  COALESCE(SUM(is_rare), 0)::BIGINT AS n_rare,
         |  COALESCE(SUM(is_rare), 0)::BIGINT * 1000 // COUNT(*)::BIGINT AS rare_pm
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // ---- k-anonymity profile over quasi-identifiers ------------------------
    // The data-governance read BESIDE pii_redact's regex scrubbing:
    // direct identifiers get redacted, but re-identification risk lives
    // in QUASI-identifier combinations (Sweeney 2002 — zip/birth/sex
    // identified 87% of the US). Group rows by every column of the
    // supplied quasi-id frame; the equivalence-class SIZE distribution is
    // the anonymity profile, and rows in classes smaller than k are the
    // re-identifiable population a release gate counts (fixture: 432
    // singleton customers under (nation, segment, balance-band) — the
    // classic surprise). Scale shape: one partial+final group count is
    // the only corpus-volume shuffle; the profile is a second agg over
    // the CLASS-SIZE DOMAIN (bounded by max class size, the rfm/ccnet
    // distribution argument); k is a pure comparison knob. ------------------
    "k_anonymity" -> QueryDef(
      (s, dir) => kAnonymityProfile(Tables.load(s, dir, "customer")
        .selectExpr("c_nationkey", "c_mktsegment",
          "CAST(c_acctbal AS BIGINT) div 1000 AS bal_band")),
      """WITH q AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(c_acctbal AS BIGINT) // 1000 AS bal_band, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT n AS class_size, COUNT(*)::BIGINT AS n_classes,
        |  SUM(n)::BIGINT AS n_rows,
        |  CAST(n < 5 AS INT) AS below_k
        |FROM q GROUP BY n ORDER BY class_size""".stripMargin),

    // ---- l-diversity profile over quasi-identifiers ------------------------
    // The homogeneity-attack guard k_anonymity can't see (Machanavajjhala
    // et al. 2007): a class of k = 50 identical quasi-ids is k-anonymous,
    // but if all 50 share ONE sensitive value the attacker learns it
    // without identifying anybody. Group by the quasi-id columns, count
    // DISTINCT sensitive values per class — the diversity-level
    // distribution is the release gate, and rows in classes with fewer
    // than l distinct sensitive values are the attribute-disclosure
    // population. Scale shape: Spark expands the distinct agg into a
    // (QI, sensitive)-keyed partial dedup before the class fold — still
    // one corpus-volume exchange family; the profile is a second agg over
    // the DIVERSITY DOMAIN (bounded by the sensitive-attribute domain,
    // the k_anonymity class-size argument); l is a pure comparison knob.
    // Fixture: sensitive = mktsegment under (nation, balance-band) —
    // the bands k_anonymity showed are mostly singletons, so low-diversity
    // classes dominate. ------------------------------------------------------
    "l_diversity" -> QueryDef(
      (s, dir) => lDiversityProfile(Tables.load(s, dir, "customer")
        .selectExpr("c_nationkey",
          "CAST(c_acctbal AS BIGINT) div 1000 AS bal_band", "c_mktsegment"),
        "c_mktsegment"),
      """WITH q AS (SELECT c_nationkey,
        |    CAST(c_acctbal AS BIGINT) // 1000 AS bal_band,
        |    COUNT(DISTINCT c_mktsegment) AS l, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2)
        |SELECT l AS diversity, COUNT(*)::BIGINT AS n_classes,
        |  SUM(n)::BIGINT AS n_rows,
        |  CAST(l < 3 AS INT) AS below_l
        |FROM q GROUP BY l ORDER BY diversity""".stripMargin),

    // ---- t-closeness profile over quasi-identifiers ------------------------
    // The skewness-attack guard l-diversity can't see (Li, Li &
    // Venkatasubramanian ICDE 2007): a class with l = 2 distinct sensitive
    // values is l-diverse, but if 99% of the GLOBAL population is healthy
    // and a class is 50/50 sick, membership alone leaks. t-closeness
    // bounds the distance between each class's sensitive-value
    // distribution and the global one; for a categorical attribute the
    // prescribed EMD with uniform ground distance IS the total variation
    // distance, and TVD = sum over values of (p_v - q_v)+ — values ABSENT
    // from a class contribute zero to the positive part, so only
    // (class, value) rows that exist are ever touched. Exact integers
    // throughout: (c_v*N - g_v*n)+ folds in DECIMAL(38,0) (c*N <= 1e26 at
    // 100 TB, *1e6 <= 1e32 — inside 38 digits; the single trunc division
    // lands in [0, 1e6] so IntegralDivide's int64 result can't wrap, the
    // ab_test_chi2 rule). Scale shape: the (QI, sensitive) group count is
    // the ONLY corpus-volume shuffle; the class-n window, the broadcast
    // |values|-row marginal join and the 1-row total are all over the
    // class domain (the ccnet windows-after-aggregation rule); the
    // banded profile bounds output at <= 1e6/bandPpm + 1 rows. t sits on
    // a band boundary by contract, so the banded gate is EXACT (integer
    // floor preserves the >= t comparison). Fixture: same frame as
    // l_diversity — the mostly-singleton bands concentrate all mass on
    // one segment, so high-TVD bands dominate. -------------------------------
    "t_closeness" -> QueryDef(
      (s, dir) => tClosenessProfile(Tables.load(s, dir, "customer")
        .selectExpr("c_nationkey",
          "CAST(c_acctbal AS BIGINT) div 1000 AS bal_band", "c_mktsegment"),
        "c_mktsegment"),
      """WITH cls AS (SELECT c_nationkey,
        |    CAST(c_acctbal AS BIGINT) // 1000 AS bal_band,
        |    c_mktsegment, COUNT(*)::BIGINT AS c
        |  FROM customer GROUP BY 1, 2, 3),
        |cn AS (SELECT c_nationkey, bal_band, SUM(c)::BIGINT AS n
        |  FROM cls GROUP BY 1, 2),
        |gl AS (SELECT c_mktsegment, SUM(c)::BIGINT AS g FROM cls GROUP BY 1),
        |tt AS (SELECT SUM(g)::BIGINT AS big_n FROM gl),
        |pv AS (SELECT cls.c_nationkey, cls.bal_band, n, big_n,
        |    CASE WHEN c::HUGEINT * big_n - g::HUGEINT * n > 0
        |         THEN c::HUGEINT * big_n - g::HUGEINT * n
        |         ELSE 0::HUGEINT END AS pos_part
        |  FROM cls JOIN cn USING (c_nationkey, bal_band)
        |  JOIN gl USING (c_mktsegment) CROSS JOIN tt),
        |pc AS (SELECT c_nationkey, bal_band, n,
        |    CAST(SUM(pos_part) * 1000000 // (n::HUGEINT * big_n) AS BIGINT)
        |      AS tvd_ppm
        |  FROM pv GROUP BY c_nationkey, bal_band, n, big_n),
        |bd AS (SELECT (tvd_ppm // 100000) * 100000 AS band_ppm, n FROM pc)
        |SELECT band_ppm, COUNT(*)::BIGINT AS n_classes, SUM(n)::BIGINT AS n_rows,
        |  CAST(band_ppm >= 400000 AS INT) AS above_t
        |FROM bd GROUP BY band_ppm ORDER BY band_ppm""".stripMargin),

    // ---- differentially-private count release (geometric mechanism) --------
    // The release mechanism beside the k/l/t gates: those PROFILE
    // re-identification risk; this one perturbs the published aggregate
    // itself. Discrete two-sided geometric noise (Ghosh–Roughgarden–
    // Sundararajan 2009 — the UNIVERSALLY optimal mechanism for count
    // queries) at alpha = 1/2, i.e. eps = ln 2 per released count,
    // sensitivity 1; disjoint groups compose in parallel, so one pass
    // over a partition of the corpus spends ln 2 total. alpha = 1/2 is
    // chosen because its CDF is DYADIC: the decode from a uniform
    // u in [0, 3*2^30 - 2) is EXACT integer arithmetic — u < 2^30 is
    // Z = 0 (mass exactly 1/3 of 3*2^30: P(0) = (1-a)/(1+a)); the rest
    // splits sign by parity and magnitude by the binary-string length of
    // the segment remainder (floor_log2 with NO float log, the hll rho
    // discipline), each magnitude z getting exactly 2^(30-z) units per
    // sign — the infinite tail truncates at |z| = 30 (2^-30 mass, the
    // last unit pair lands on z = 30). The uniform comes from the shared
    // portable chain: graft_polyhash(key) -> the hllIdExprs mid-square
    // widening (a linear mix of a ~30-bit hash would under-fill the
    // 3.2e9-unit domain) -> hllVExpr -> mod. DETERMINISM CAVEAT, stated
    // honestly: noise derived from the group key is idempotent
    // re-release (same key, same noise — repeated queries leak nothing
    // new) but an adversary who knows the key can invert it; a
    // production release swaps the hash-derived uniform for one fresh
    // CSPRNG draw per (key, release) while keeping this exact decode.
    // Scale shape: the group count is the ONLY shuffle (partial+final);
    // hash, decode and clamp are pure map-side projection over the
    // group domain. The registry row keeps true_n/noise visible (the
    // calibration read); withTrue = false is the release path. ----------
    "dp_counts" -> QueryDef(
      (s, dir) => dpCounts(Tables.load(s, dir, "orders")
        .select("o_orderpriority", "o_orderstatus")), {
        import graft.functions.Portable.{MIX, MIX2, P, P2, P61}
        s"""WITH g AS (SELECT o_orderpriority, o_orderstatus,
           |    COUNT(*)::BIGINT AS true_n
           |  FROM orders GROUP BY 1, 2),
           |hh AS (SELECT *, ${graft.functions.Portable.duckPolyHashSql(
                "(o_orderpriority || '|' || o_orderstatus)")} AS h FROM g),
           |ff AS (SELECT *,
           |    ((((h % $P) * (h % $P)) % $P) * $MIX + (h % $P)) % $P AS h1,
           |    ((((h % $P2) * (h % $P2)) % $P2) * $MIX2 + (h % $P2)) % $P2 AS h2
           |  FROM hh),
           |vv AS (SELECT *,
           |    ((((h1 * 2147483648 + h2) % 2147483648) * $MIX) % $P61
           |     + (((h1 * 2147483648 + h2) // 2147483648) * $MIX2) % $P61)
           |    % $P61 % 3221225470 AS u FROM ff),
           |nn AS (SELECT o_orderpriority, o_orderstatus, true_n,
           |    CASE WHEN u < 1073741824 THEN 0
           |         ELSE (1 - 2 * ((u - 1073741824) % 2))
           |            * (31 - length(bin(1073741823 - (u - 1073741824) // 2)))
           |    END::BIGINT AS noise FROM vv)
           |SELECT o_orderpriority, o_orderstatus, true_n, noise,
           |  CASE WHEN true_n + noise < 0 THEN 0 ELSE true_n + noise END AS released
           |FROM nn ORDER BY o_orderpriority, o_orderstatus""".stripMargin
      }),

    // ---- DP quantile release (the governance ladder's distribution
    // artifact beside dp_counts' count release): the published
    // noisy-histogram mechanism — bucket the value by the HDR base-2
    // geometry (quantile_sketch's exact kernel), add the SAME two-sided
    // dyadic geometric noise dp_counts draws (eps = ln 2 per bucket,
    // seeded by the bucket id through the shared polyhash→fingerprint
    // chain — the same determinism caveat, same production-CSPRNG swap),
    // clamp, and read quantiles off the NOISY histogram. Any statistic
    // computed from a DP release stays DP (post-processing invariance),
    // so the released p50/p90/p99 inherit the histogram's budget.
    // Registry row = the calibration report (released beside true —
    // dp_counts' withTrue discipline; `withTrue = false` is the release
    // path). Scale shape: ONE corpus fold into the ≤ ~1.9k-bucket
    // domain; noise is map-side over domain rows; both readout windows
    // run over the domain, never corpus rows. Substrate: order totals
    // in cents — the transaction-amount telemetry release this
    // mechanism exists for. -----------------------------------------------
    "dp_quantiles" -> QueryDef(
      (s, dir) => dpQuantiles(Tables.load(s, dir, "orders")
        .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x"),
        "x"), {
        import graft.functions.Portable.{MIX, MIX2, P, P2, P61}
        s"""WITH v AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
           |  FROM orders),
           |h0 AS (SELECT CASE WHEN x < 32 THEN x
           |    ELSE (length(bin(x)) - 6) * 32 + (x >> (length(bin(x)) - 6))
           |    END AS bkt, COUNT(*)::BIGINT AS cnt
           |  FROM v GROUP BY 1),
           |hh AS (SELECT *, ${graft.functions.Portable.duckPolyHashSql(
                "CAST(bkt AS VARCHAR)")} AS h FROM h0),
           |ff AS (SELECT *,
           |    ((((h % $P) * (h % $P)) % $P) * $MIX + (h % $P)) % $P AS h1,
           |    ((((h % $P2) * (h % $P2)) % $P2) * $MIX2 + (h % $P2)) % $P2 AS h2
           |  FROM hh),
           |vv AS (SELECT *,
           |    ((((h1 * 2147483648 + h2) % 2147483648) * $MIX) % $P61
           |     + (((h1 * 2147483648 + h2) // 2147483648) * $MIX2) % $P61)
           |    % $P61 % 3221225470 AS u FROM ff),
           |nn AS (SELECT bkt, cnt,
           |    CASE WHEN u < 1073741824 THEN 0
           |         ELSE (1 - 2 * ((u - 1073741824) % 2))
           |            * (31 - length(bin(1073741823 - (u - 1073741824) // 2)))
           |    END::BIGINT AS noise FROM vv),
           |noisy AS (SELECT bkt, cnt + noise AS cnt FROM nn WHERE cnt + noise > 0),
           |q AS (SELECT unnest([500, 900, 990]) AS q_pm),
           |cT AS (SELECT bkt, cnt, SUM(cnt) OVER ()::BIGINT AS n,
           |    SUM(cnt) OVER (ORDER BY bkt
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
           |  FROM h0),
           |eT AS (SELECT q_pm, n, MIN(bkt) AS qb
           |  FROM cT CROSS JOIN q WHERE cum >= (q_pm * n + 999) // 1000
           |  GROUP BY 1, 2),
           |estT AS (SELECT q_pm, n AS true_n,
           |    CASE WHEN qb < 32 THEN qb
           |         ELSE ((qb % 32) + 32) << ((qb // 32) - 1) END AS true_q
           |  FROM eT),
           |cN AS (SELECT bkt, cnt, SUM(cnt) OVER ()::BIGINT AS n,
           |    SUM(cnt) OVER (ORDER BY bkt
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
           |  FROM noisy),
           |eN AS (SELECT q_pm, n, MIN(bkt) AS qb
           |  FROM cN CROSS JOIN q WHERE cum >= (q_pm * n + 999) // 1000
           |  GROUP BY 1, 2),
           |estN AS (SELECT q_pm, n AS released_n,
           |    CASE WHEN qb < 32 THEN qb
           |         ELSE ((qb % 32) + 32) << ((qb // 32) - 1) END AS released_q
           |  FROM eN)
           |SELECT q_pm, true_n, true_q,
           |  COALESCE(released_n, 0) AS released_n,
           |  COALESCE(released_q, 0) AS released_q
           |FROM estT LEFT JOIN estN USING (q_pm)
           |ORDER BY q_pm""".stripMargin
      }),

    // ---- Benford first-digit deviation screen -------------------------------
    // The forensic-audit read beside the governance gates: naturally-grown
    // multiplicative quantities (revenues, populations, transaction sums)
    // follow Benford's first-digit law; fabricated, capped or
    // uniform-generated ones don't (Nigrini 1996 — the standard fraud
    // screen). Per group: exact-integer TVD between the observed
    // first-digit distribution and the published Benford ppm constants
    // (rounded offline by largest remainder to sum to exactly 1e6 —
    // log10 is transcendental and never runs in-engine). First digit =
    // head of the decimal string (pure string algebra, identical in both
    // engines for positive int64 — no float pow/log10). The 9-digit
    // expected frame broadcasts into the group domain so ABSENT digits
    // still contribute their expected mass. Scale shape: the (group,
    // digit) count is the ONLY corpus-volume shuffle, combiner-perfect
    // at <= 9 rows per group per map task; everything after is
    // group-domain-sized. Fixture: TPC-H's uniform prices FAIL the
    // screen loudly (tvd ~ 24%), which is exactly what the screen is
    // for — the spec pins a 2^k geometric series PASSING it. ---------------
    "benford_screen" -> QueryDef(
      (s, dir) => benfordScreen(Tables.load(s, dir, "orders")
        .selectExpr("o_orderpriority AS prio",
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x"),
        "x"),
      s"""WITH v AS (SELECT o_orderpriority AS prio,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
         |  FROM orders),
         |dg AS (SELECT prio,
         |    CAST(substring(CAST(x AS VARCHAR), 1, 1) AS BIGINT) AS d,
         |    COUNT(*)::BIGINT AS c
         |  FROM v WHERE x > 0 GROUP BY 1, 2),
         |nf AS (SELECT prio, SUM(c)::BIGINT AS n FROM dg GROUP BY 1),
         |ds AS (SELECT unnest(range(1, 10)) AS d),
         |ex AS (SELECT d, ${benfordCaseSql("d")} AS exp_ppm FROM ds),
         |fl AS (SELECT prio, n,
         |    ABS(COALESCE(c, 0)::HUGEINT * 1000000 // n - exp_ppm) AS dev
         |  FROM nf CROSS JOIN ex
         |  LEFT JOIN dg USING (prio, d))
         |SELECT prio, n, CAST(SUM(dev) // 2 AS BIGINT) AS tvd_ppm,
         |  CAST(CAST(SUM(dev) // 2 AS BIGINT) >= 50000 AS INT) AS suspicious
         |FROM fl GROUP BY prio, n ORDER BY prio""".stripMargin),

    // ---- median/MAD robust outlier profile ----------------------------------
    // The robust screen beside ts_anomaly's mean/stddev z-score: mean and
    // stddev are themselves dragged by the outliers they hunt (one 1e9
    // row in a 1e3-median group moves the mean past every legitimate
    // row); median and MAD have breakdown point 1/2 (Hampel 1974,
    // Leys et al. 2013 — "detecting outliers: do not use the mean").
    // All exact integers: the flag is |x − med|·1000 > kMilli·MAD staged
    // in DECIMAL(38,0) (a comparison, never a division); the float
    // 1.4826 normal-consistency constant never runs in-engine — kMilli
    // ABSORBS it (4448 ≈ 3 sigma for normal data; the default 5000 is
    // deliberately blunter). MAD = 0 (over half the group at the median)
    // flags every deviant — the textbook degenerate read, kept. Scale
    // shape: robust stats cost TWO distribution passes (value then
    // |deviation|), each the ccnet cutoff trick — a corpus-volume
    // combiner-perfect fold + windows over the DISTRIBUTION domain,
    // never a corpus sort; the medians broadcast back (group-domain
    // frames), and the profile fold is combiner-perfect. Output is one
    // row per group (n, med, mad, n_outliers, outlier_ppm) — the
    // release-gate read; the flagged rows themselves are the same dev
    // frame with the comparison kept, a caller filter. -----------------------
    "mad_outliers" -> QueryDef(
      (s, dir) => madOutliers(Tables.load(s, dir, "orders")
        .selectExpr("o_orderpriority AS prio",
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x"),
        "x", kMilli = 2000L),
      """WITH v AS (SELECT o_orderpriority AS prio,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM orders),
        |d AS (SELECT prio, x, COUNT(*)::BIGINT AS c FROM v GROUP BY 1, 2),
        |dc AS (SELECT prio, x,
        |    SUM(c) OVER (PARTITION BY prio)::BIGINT AS n,
        |    SUM(c) OVER (PARTITION BY prio ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        |  FROM d),
        |md AS (SELECT prio, MIN(x) AS med FROM dc
        |  WHERE cum >= (500 * n + 999) // 1000 GROUP BY 1),
        |dv AS (SELECT prio, med, ABS(x - med) AS adev
        |  FROM v JOIN md USING (prio)),
        |a AS (SELECT prio, adev, COUNT(*)::BIGINT AS c FROM dv GROUP BY 1, 2),
        |ac AS (SELECT prio, adev,
        |    SUM(c) OVER (PARTITION BY prio)::BIGINT AS n,
        |    SUM(c) OVER (PARTITION BY prio ORDER BY adev
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        |  FROM a),
        |mm AS (SELECT prio, MIN(adev) AS mad FROM ac
        |  WHERE cum >= (500 * n + 999) // 1000 GROUP BY 1)
        |SELECT prio, COUNT(*)::BIGINT AS n, med, mad,
        |  SUM((dv.adev::HUGEINT * 1000 > 2000 * mad::HUGEINT)::INT)::BIGINT
        |    AS n_outliers,
        |  CAST(SUM((dv.adev::HUGEINT * 1000 > 2000 * mad::HUGEINT)::INT)::HUGEINT
        |    * 1000000 // COUNT(*) AS BIGINT) AS outlier_ppm
        |FROM dv JOIN mm USING (prio)
        |GROUP BY prio, med, mad ORDER BY prio""".stripMargin),

    // ---- mergeable HDR-histogram quantile sketch + calibration -------------
    // The quantile member of the mergeable-sketch family (HLL for
    // distinct, CMS for frequency, THIS for percentiles): exact
    // percentiles need a per-group corpus sort; the sketch needs one
    // combiner-perfect histogram fold. Bucket = HdrHistogram/DDSketch
    // base-2 geometry in pure int64 (no float log, the hll rho
    // discipline): values below 2^b land in exact identity buckets;
    // above, bucket = (e − b)·2^b + (x >> (e − b)) with e =
    // binary-string-length(x) − 1 — monotone in x, relative error
    // ≤ 2^−b (3.1% at b = 5), domain ≤ (64 − b)·2^b ≈ 1.9k buckets for
    // ANY int64 input. Counts ADD, so the (group, bucket) count is the
    // defining mergeable fold: each map task ships ≤ domain rows (the
    // CMS/HLL discipline) and shards/days/sources merge by summing.
    // Quantile read = cumulative count over the BUCKET DOMAIN (the
    // ccnet windows-after-aggregation rule), type-1 rank ceil(q·n/1000),
    // estimate = the bucket's lower bound — BY CONSTRUCTION est_q <=
    // exact_q with one-sided error, so the calibration column reads
    // cleanly. The registry row is the calibration report (the
    // hll_distinct pattern): est vs the EXACT type-1 percentile computed
    // over the per-(group, value) distribution — itself the ccnet
    // distribution-cutoff trick, never a row_number over the corpus —
    // with withExact = false dropping the exact columns AND the
    // value-distribution shuffle (the 100 TB path). err_ppm stages in
    // DECIMAL(38,0) so a 2^62-magnitude estimate can't wrap the int64
    // product (the ab_test IntegralDivide rule). --------------------------
    "quantile_sketch" -> QueryDef(
      (s, dir) => quantileSketch(Tables.load(s, dir, "lineitem")
        .selectExpr("l_returnflag AS flag",
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x"),
        "x"),
      """WITH v AS (SELECT l_returnflag AS flag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM lineitem),
        |h AS (SELECT flag,
        |    CASE WHEN x < 32 THEN x
        |         ELSE (length(bin(x)) - 6) * 32 + (x >> (length(bin(x)) - 6))
        |    END AS bkt, COUNT(*)::BIGINT AS cnt
        |  FROM v GROUP BY 1, 2),
        |c AS (SELECT flag, bkt, cnt,
        |    SUM(cnt) OVER (PARTITION BY flag)::BIGINT AS n,
        |    SUM(cnt) OVER (PARTITION BY flag ORDER BY bkt
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        |  FROM h),
        |q AS (SELECT unnest([500, 900, 990]) AS q_pm),
        |e AS (SELECT flag, q_pm, n, MIN(bkt) AS qb
        |  FROM c CROSS JOIN q WHERE cum >= (q_pm * n + 999) // 1000
        |  GROUP BY 1, 2, 3),
        |est AS (SELECT flag, q_pm, n,
        |    CASE WHEN qb < 32 THEN qb
        |         ELSE ((qb % 32) + 32) << ((qb // 32) - 1) END AS est_q
        |  FROM e),
        |d AS (SELECT flag, x, COUNT(*)::BIGINT AS c FROM v GROUP BY 1, 2),
        |dc AS (SELECT flag, x,
        |    SUM(c) OVER (PARTITION BY flag)::BIGINT AS n,
        |    SUM(c) OVER (PARTITION BY flag ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        |  FROM d),
        |ex AS (SELECT flag, q_pm, MIN(x) AS exact_q
        |  FROM dc CROSS JOIN q WHERE cum >= (q_pm * n + 999) // 1000
        |  GROUP BY 1, 2)
        |SELECT est.flag, q_pm, n, est_q, exact_q,
        |  CASE WHEN exact_q = 0 THEN 0
        |       ELSE CAST(ABS(est_q - exact_q)::HUGEINT * 1000000 // exact_q
        |            AS BIGINT) END AS err_ppm
        |FROM est JOIN ex USING (flag, q_pm)
        |ORDER BY flag, q_pm""".stripMargin),

    // ---- HyperLogLog distinct-trigram census + calibration ----------------
    // The mergeable-cardinality tail knob corpus_diversity documents made
    // REAL: per-source distinct-trigram estimate from m = 256 max-rho
    // registers — the sketch path when exact distinct stops being worth
    // the corpus-volume shuffle. Scale shape: register index and rho are
    // pure map-side int64 algebra over the shared paired 60-bit n-gram
    // fingerprint (mix mod P61, trailing-zero rank via an exact
    // binary-string length — NO log2, whose libm rounding differs across
    // engines), the ONLY corpus-volume shuffle is the (source, idx)
    // max-fold — combiner-perfect (max merges associatively: each map
    // task ships ≤ m register rows, the CMS/TopK mergeable-sketch
    // discipline), output ≤ |sources|·m rows at ANY corpus size. The
    // estimate itself is the Flajolet raw harmonic mean in EXACT integer
    // form: registers scale to 2^(cap − rho) int64 (cap sized so the
    // all-empty sum is 2^62), alpha·m² folds in DECIMAL(38,0). The
    // registry row is the CALIBRATION report (minhash_calibration's
    // pattern): est vs exact vs abs_err_ppm, the read before trusting
    // the sketch on a new corpus — withExact = false drops the exact
    // columns AND the distinct shuffle (the 100 TB path). m is the
    // accuracy knob (std err ~1.04/sqrt(m): 6.5% at 256); the fixture's
    // ~1.3k distinct trigrams per source sit safely above the 2.5·m
    // small-range zone — below it the linear-counting correction needs
    // ln (transcendental, banned), so zero_registers ships in the frame
    // for the caller to apply engine-side. ------------------------------
    "hll_distinct" -> QueryDef(
      (s, dir) => hllDistinct(Tables.load(s, dir, "documents")), {
        import graft.functions.Portable.{MIX, MIX2, P, P2, P61}
        val m = 256; val cap = 54; val alphaPpm = hllAlphaPpm(m)
        s"""WITH th AS (SELECT source,
           |    ${graft.functions.Portable.duckHashTokensSql(duckToks)} AS th
           |  FROM documents),
           |g AS (SELECT source,
           |    unnest(CASE WHEN len(th) >= 3 THEN list_transform(range(3, len(th) + 1),
           |      i -> ((((th[i-2] * $MIX + th[i-1]) % $P) * $MIX + th[i]) % $P) * 2147483648
           |         + (((th[i-2] * $MIX2 + th[i-1]) % $P2) * $MIX2 + th[i]) % $P2)
           |      ELSE CAST([] AS BIGINT[]) END) AS fp
           |  FROM th),
           |v AS (SELECT source,
           |    (((fp % 2147483648) * $MIX) % $P61
           |     + ((fp // 2147483648) * $MIX2) % $P61) % $P61 AS v FROM g),
           |r AS (SELECT source, v % $m AS idx,
           |    CASE WHEN v // $m = 0 THEN $cap
           |         ELSE length(bin((v // $m) & (-(v // $m)))) END AS rho FROM v),
           |mr AS (SELECT source, idx, MAX(rho) AS mj FROM r GROUP BY source, idx),
           |sc AS (SELECT source,
           |    SUM(1::BIGINT << ($cap - mj)) + ($m - COUNT(*)) * (1::BIGINT << $cap) AS s_scaled,
           |    $m - COUNT(*) AS zero_registers
           |  FROM mr GROUP BY source),
           |e AS (SELECT source, zero_registers,
           |    ($alphaPpm::HUGEINT * ${m.toLong * m} * (1::HUGEINT << $cap)
           |     // (s_scaled::HUGEINT * 1000000))::BIGINT AS est_distinct
           |  FROM sc),
           |x AS (SELECT source, COUNT(DISTINCT fp) AS exact_distinct FROM g GROUP BY source)
           |SELECT e.source, est_distinct, exact_distinct,
           |  ABS(est_distinct - exact_distinct) * 1000000 // exact_distinct AS abs_err_ppm,
           |  zero_registers
           |FROM e JOIN x USING (source) ORDER BY source""".stripMargin
      }),

    // ---- pairwise cross-source overlap via HLL register merge -------------
    // source_overlap's sketch-path twin: that operator counts exact shared
    // shingles through a corpus-volume DISTINCT + self-join; this one
    // MERGES the per-source register tables hll_distinct already builds
    // (union = per-index max, HLL's defining mergeability) and reads the
    // intersection from inclusion–exclusion est(A)+est(B)−est(A∪B),
    // clamped at 0. Scale shape: after the one combiner-perfect register
    // fold, EVERYTHING pair-shaped is sketch-sized — |sources|²·m register
    // rows, never corpus rows (the 190-pair fixture costs 48k rows where
    // source_overlap's self-join fans out every duplicated shingle).
    // Accuracy: the I–E difference inherits ~1.04/sqrt(m) error from THREE
    // estimates, so small intersections drown in sketch noise — which is
    // exactly why the registry row is the CALIBRATION report (est vs the
    // exact distinct-fp intersection per pair); withExact = false is the
    // 100 TB sketch-only path. --------------------------------------------
    "hll_overlap" -> QueryDef(
      (s, dir) => hllOverlap(Tables.load(s, dir, "documents")), {
        import graft.functions.Portable.{MIX, MIX2, P, P2, P61}
        val m = 256; val cap = 54; val alphaPpm = hllAlphaPpm(m)
        s"""WITH th AS (SELECT source,
           |    ${graft.functions.Portable.duckHashTokensSql(duckToks)} AS th
           |  FROM documents),
           |g AS (SELECT source,
           |    unnest(CASE WHEN len(th) >= 3 THEN list_transform(range(3, len(th) + 1),
           |      i -> ((((th[i-2] * $MIX + th[i-1]) % $P) * $MIX + th[i]) % $P) * 2147483648
           |         + (((th[i-2] * $MIX2 + th[i-1]) % $P2) * $MIX2 + th[i]) % $P2)
           |      ELSE CAST([] AS BIGINT[]) END) AS fp
           |  FROM th),
           |v AS (SELECT source,
           |    (((fp % 2147483648) * $MIX) % $P61
           |     + ((fp // 2147483648) * $MIX2) % $P61) % $P61 AS v FROM g),
           |r AS (SELECT source, v % $m AS idx,
           |    CASE WHEN v // $m = 0 THEN $cap
           |         ELSE length(bin((v // $m) & (-(v // $m)))) END AS rho FROM v),
           |mr AS (SELECT source, idx, MAX(rho) AS mj FROM r GROUP BY source, idx),
           |sc AS (SELECT source,
           |    SUM(1::BIGINT << ($cap - mj)) + ($m - COUNT(*)) * (1::BIGINT << $cap) AS s_scaled
           |  FROM mr GROUP BY source),
           |e AS (SELECT source,
           |    ($alphaPpm::HUGEINT * ${m.toLong * m} * (1::HUGEINT << $cap)
           |     // (s_scaled::HUGEINT * 1000000))::BIGINT AS est FROM sc),
           |pr AS (SELECT a.source AS src_a, b.source AS src_b
           |  FROM (SELECT DISTINCT source FROM mr) a
           |  JOIN (SELECT DISTINCT source FROM mr) b ON a.source < b.source),
           |ur AS (SELECT src_a, src_b, idx, MAX(mj) AS mj
           |  FROM pr JOIN mr ON source = src_a OR source = src_b
           |  GROUP BY 1, 2, 3),
           |usc AS (SELECT src_a, src_b,
           |    SUM(1::BIGINT << ($cap - mj)) + ($m - COUNT(*)) * (1::BIGINT << $cap) AS s_scaled
           |  FROM ur GROUP BY 1, 2),
           |ue AS (SELECT src_a, src_b,
           |    ($alphaPpm::HUGEINT * ${m.toLong * m} * (1::HUGEINT << $cap)
           |     // (s_scaled::HUGEINT * 1000000))::BIGINT AS est_union FROM usc),
           |ex AS (SELECT DISTINCT source, fp FROM g),
           |xi AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS exact_intersect
           |  FROM ex a JOIN ex b ON a.fp = b.fp AND a.source < b.source
           |  GROUP BY 1, 2)
           |SELECT ue.src_a, ue.src_b, ea.est AS est_a, eb.est AS est_b, est_union,
           |  greatest(0, ea.est + eb.est - est_union) AS est_intersect,
           |  COALESCE(exact_intersect, 0) AS exact_intersect,
           |  CASE WHEN est_union > 0
           |    THEN greatest(0, ea.est + eb.est - est_union) * 1000000 // est_union
           |    ELSE 0 END AS jaccard_ppm
           |FROM ue JOIN e ea ON ea.source = ue.src_a
           |JOIN e eb ON eb.source = ue.src_b
           |LEFT JOIN xi ON xi.src_a = ue.src_a AND xi.src_b = ue.src_b
           |ORDER BY ue.src_a, ue.src_b""".stripMargin
      })
  )

  /** Rare-vocabulary density of any (doc_id, text) frame — see the
    * `rare_token_docs` registry comment. `rareDf` is the
    * document-frequency cutoff: a token is rare iff it appears in at
    * most `rareDf` documents.
    */
  def rareTokenDocs(docs: DataFrame, rareDf: Int = 2): DataFrame = {
    require(rareDf >= 1, s"rareDf must be >= 1, got $rareDf")
    val dt = docs.selectExpr("doc_id",
        s"explode(${graft.functions.Portable.tokensSql("text")}) AS tok")
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dfc = dt.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    dt.join(dfc, "tok")
      .selectExpr("doc_id", s"CAST(df <= $rareDf AS INT) AS is_rare")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct"),
        coalesce(sum(col("is_rare")), lit(0L)).as("n_rare"))
      .selectExpr("doc_id", "n_distinct", "n_rare",
        "n_rare * 1000L div n_distinct AS rare_pm")
      .transform(Sorted.byNames(_, "doc_id"))
  }

  /** PMI-ranked bigram collocations of any (doc_id, text) frame — see the
    * `pmi_collocations` registry comment for the lift arithmetic and the
    * staged-headroom contract. `minCount` prunes the pair table before
    * any join (the frequent-head filter that keeps the only vocab²-shaped
    * frame bounded); `topK` bounds the presentation output.
    */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5L,
      topK: Int = 50): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = docs
      .select(expr(graft.functions.Portable.tokensSql("text")).as("ts"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tot = toks.agg(
      coalesce(sum(expr("size(ts)")), lit(0L))
        .cast("decimal(38,0)").as("nt"),
      coalesce(sum(expr("GREATEST(size(ts) - 1, 0)")), lit(0L))
        .cast("decimal(38,0)").as("mt"))
    val pairC = toks.filter("size(ts) >= 2")
      .select(explode(expr(
        "transform(sequence(2, size(ts)), i -> concat(ts[i-2], ' ', ts[i-1]))"))
        .as("big"))
      .groupBy(col("big")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val uniC = toks.select(explode(col("ts")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    pairC
      .selectExpr("split(big, ' ')[0] AS w1", "split(big, ' ')[1] AS w2", "c12")
      .join(uniC.withColumnRenamed("w", "w1").withColumnRenamed("cw", "c1"), "w1")
      .join(uniC.withColumnRenamed("w", "w2").withColumnRenamed("cw", "c2"), "w2")
      .crossJoin(broadcast(tot))
      .selectExpr("w1", "w2", "c12", "c1", "c2",
        "CAST((CAST(c12 AS DECIMAL(38,0)) * nt * 1000000" +
          " div (CAST(c1 AS DECIMAL(38,0)) * c2)) * nt div mt AS BIGINT)" +
          " AS lift_ppm")
      .orderBy(col("lift_ppm").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
  }

  /** Confusion-matrix evaluation of a scored gate frame against a truth
    * expression — see the `classifier_eval` registry comment. `scored`
    * carries the [[hashedClassifierScore]] columns (any frame with
    * `keep` and the label-expression inputs works); returns ONE row of
    * int64 counts + per-mille precision/recall/accuracy with
    * zero-denominator guards. */
  def classifierEval(scored: DataFrame, labelExpr: String): DataFrame =
    scored
      .selectExpr(s"IF($labelExpr, 1, 0) AS y", "keep")
      .agg(
        sum(expr("IF(y = 1 AND keep = 1, 1L, 0L)")).as("tp"),
        sum(expr("IF(y = 0 AND keep = 1, 1L, 0L)")).as("fp"),
        sum(expr("IF(y = 1 AND keep = 0, 1L, 0L)")).as("fn"),
        sum(expr("IF(y = 0 AND keep = 0, 1L, 0L)")).as("tn"))
      .selectExpr("tp + fp + fn + tn AS n", "tp", "fp", "fn", "tn",
        "CASE WHEN tp + fp = 0 THEN 0L ELSE tp * 1000L div (tp + fp) END AS precision_pm",
        "CASE WHEN tp + fn = 0 THEN 0L ELSE tp * 1000L div (tp + fn) END AS recall_pm",
        "CASE WHEN tp + fp + fn + tn = 0 THEN 0L " +
          "ELSE (tp + tn) * 1000L div (tp + fp + fn + tn) END AS accuracy_pm")

  /** Corpus snapshot diff — see the `snapshot_diff` registry comment.
    * Both inputs carry (doc_id, text, source); identity is doc_id,
    * equality is [[graft.functions.Portable.contentDigest]] (null-safe:
    * two null-text versions of a doc compare unchanged). Returns one row
    * per doc_id in either version with status
    * added/removed/changed/unchanged and the surviving source. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"),
      graft.functions.Portable.contentDigest.as("d1"),
      col("source").as("src1"), lit(1).as("p1"))
    val b = v2.select(col("doc_id"),
      graft.functions.Portable.contentDigest.as("d2"),
      col("source").as("src2"), lit(1).as("p2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .selectExpr("doc_id", "coalesce(src2, src1) AS source",
        """CASE WHEN p1 IS NULL THEN 'added'
          |     WHEN p2 IS NULL THEN 'removed'
          |     WHEN d1 <=> d2 THEN 'unchanged'
          |     ELSE 'changed' END AS status""".stripMargin)
      .transform(Sorted.byNames(_, "doc_id"))
  }

  /** Flajolet et al. 2007 bias constant alpha_m, in parts-per-million.
    * The small-m table values below 128, the closed form above; ONE
    * definition interpolated into BOTH engines' plans so the scaling can
    * never desynchronize. */
  private[operators] def hllAlphaPpm(m: Int): Long = m match {
    case 16 => 673000L
    case 32 => 697000L
    case 64 => 709000L
    case _  => math.round(0.7213 / (1.0 + 1.079 / m) * 1e6)
  }

  /** k-anonymity profile of a quasi-identifier frame — EVERY column of
    * `quasiIds` is part of the key (select the quasi-identifier
    * combination before calling; generalization bands like `bal div
    * 1000` are the caller's policy). See the `k_anonymity` registry
    * comment for the risk and scale contracts. */
  def kAnonymityProfile(quasiIds: DataFrame, k: Long = 5L): DataFrame = {
    require(k >= 2, s"k must be >= 2 to mean anything, got $k")
    require(quasiIds.columns.nonEmpty, "need at least one quasi-identifier column")
    quasiIds
      .groupBy(quasiIds.columns.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .groupBy(col("n").as("class_size"))
      .agg(count(lit(1)).as("n_classes"), sum(col("n")).as("n_rows"))
      .selectExpr("class_size", "n_classes", "n_rows",
        s"CAST(class_size < ${k}L AS INT) AS below_k")
      .transform(Sorted.byNames(_, "class_size"))
  }

  /** Chi-square screen of every hashed-bigram feature against a binary
    * label — see the `feature_chi2` registry comment. `posExpr` is a SQL
    * boolean over the doc columns (the trainHashedClassifier contract);
    * `topK` bounds the report; `critMilli` is the significance knob
    * shared with the A/B readout. */
  def featureChi2(docs: DataFrame, posExpr: String, topK: Int = 50,
      critMilli: Long = 3841L): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val l = hashedFeatures(docs)
      .withColumn("pos", expr(s"CAST($posExpr AS INT)"))
    val bc = l.groupBy(col("bkt")).agg(
      sum(expr("CAST(pos AS BIGINT)")).as("conv_a"),
      sum(expr("CAST(1 - pos AS BIGINT)")).as("conv_b"))
    val tot = bc.agg(
      coalesce(sum(col("conv_a")), lit(0L)).as("n_a"),
      coalesce(sum(col("conv_b")), lit(0L)).as("n_b"))
    EventOps.chi2Readout(bc.crossJoin(broadcast(tot)), critMilli,
        keyCols = Seq("bkt"))
      .selectExpr("bkt", "conv_a AS pos_count", "conv_b AS neg_count",
        "chi2_milli", "significant")
      .orderBy(col("chi2_milli").desc, col("bkt"))
      .limit(topK)
  }

  /** l-diversity profile of a quasi-identifier + sensitive-attribute
    * frame — see the `l_diversity` registry comment. Every column of
    * `frame` EXCEPT `sensitiveCol` is part of the quasi-identifier key
    * (the kAnonymityProfile contract); `l` is the distinct-sensitive
    * threshold below which a class reads attribute-disclosing. */
  def lDiversityProfile(frame: DataFrame, sensitiveCol: String,
      l: Long = 3L): DataFrame = {
    require(l >= 2, s"l must be >= 2 to mean anything, got $l")
    require(frame.columns.contains(sensitiveCol),
      s"sensitive column $sensitiveCol not in ${frame.columns.mkString(",")}")
    val qi = frame.columns.filterNot(_ == sensitiveCol)
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    frame
      .groupBy(qi.map(col): _*)
      .agg(countDistinct(col(sensitiveCol)).as("l"), count(lit(1)).as("n"))
      .groupBy(col("l").as("diversity"))
      .agg(count(lit(1)).as("n_classes"), sum(col("n")).as("n_rows"))
      .selectExpr("diversity", "n_classes", "n_rows",
        s"CAST(diversity < ${l}L AS INT) AS below_l")
      .transform(Sorted.byNames(_, "diversity"))
  }

  /** t-closeness profile of a quasi-identifier + sensitive-attribute
    * frame — see the `t_closeness` registry comment. Every column of
    * `frame` EXCEPT `sensitiveCol` is part of the quasi-identifier key
    * (the kAnonymityProfile contract). Per class, tvd_ppm is the exact
    * integer total variation distance (= categorical EMD) between the
    * class's sensitive-value distribution and the global one; the output
    * is the banded profile with the above-t population flagged. `tPpm`
    * must sit on a `bandPpm` boundary so the banded gate is exact. */
  def tClosenessProfile(frame: DataFrame, sensitiveCol: String,
      tPpm: Long = 400000L, bandPpm: Long = 100000L): DataFrame = {
    require(tPpm > 0 && tPpm <= 1000000L, s"tPpm must be in (0, 1e6], got $tPpm")
    require(bandPpm > 0 && tPpm % bandPpm == 0,
      s"tPpm ($tPpm) must be a multiple of bandPpm ($bandPpm) so the banded gate is exact")
    require(frame.columns.contains(sensitiveCol),
      s"sensitive column $sensitiveCol not in ${frame.columns.mkString(",")}")
    val qi = frame.columns.filterNot(_ == sensitiveCol)
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    // the ONLY corpus-volume shuffle: (QI, sensitive) counts
    val cls = frame
      .groupBy((qi :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("c"))
    // everything below runs over the class domain
    val glob = cls.groupBy(col(sensitiveCol)).agg(sum(col("c")).as("g"))
    val tot = glob.agg(sum(col("g")).as("big_n"))
    val perVal = cls
      .withColumn("n", sum(col("c")).over(Window.partitionBy(qi.map(col): _*)))
      .join(broadcast(glob), Seq(sensitiveCol))
      .crossJoin(broadcast(tot))
      .selectExpr(qi ++ Seq("n", "big_n",
        // (p_v - q_v)+ scaled by n*N, exact in DECIMAL(38,0)
        """CASE WHEN CAST(c AS DECIMAL(38,0)) * big_n - CAST(g AS DECIMAL(38,0)) * n > 0
          |     THEN CAST(c AS DECIMAL(38,0)) * big_n - CAST(g AS DECIMAL(38,0)) * n
          |     ELSE CAST(0 AS DECIMAL(38,0)) END AS pos_part""".stripMargin): _*)
    val perClass = perVal
      .groupBy((qi ++ Seq("n", "big_n")).map(col): _*)
      .agg(sum(col("pos_part")).as("num"))
      // numerator <= n*N so the quotient lands in [0, 1e6]: int64-safe
      .selectExpr("n",
        "(num * 1000000) div (CAST(n AS DECIMAL(38,0)) * big_n) AS tvd_ppm")
    perClass
      .selectExpr(s"(tvd_ppm div ${bandPpm}L) * ${bandPpm}L AS band_ppm", "n")
      .groupBy(col("band_ppm"))
      .agg(count(lit(1)).as("n_classes"), sum(col("n")).as("n_rows"))
      .selectExpr("band_ppm", "n_classes", "n_rows",
        s"CAST(band_ppm >= ${tPpm}L AS INT) AS above_t")
      .transform(Sorted.byNames(_, "band_ppm"))
  }

  /** Exact integer decode of a two-sided geometric(alpha = 1/2) draw from
    * a uniform int64 `u` expression over [0, 3*2^30 - 2) — see the
    * `dp_counts` registry comment for the dyadic mass accounting. Shared
    * by the batch release and the spec's literal-u replay. */
  private[graft] def geometricNoiseExpr(u: String): String =
    s"CASE WHEN $u < 1073741824L THEN 0L " +
      s"ELSE CAST(1L - 2L * (($u - 1073741824L) % 2L) AS BIGINT) * " +
      s"CAST(31 - length(conv(1073741823L - ($u - 1073741824L) div 2L, 10, 2)) AS BIGINT) END"

  /** Geometric-mechanism count release over a group-key frame — EVERY
    * column of `frame` is part of the key (the kAnonymityProfile
    * contract). See the `dp_counts` registry comment for the mechanism,
    * the eps = ln 2 budget and the determinism caveat. `withTrue = false`
    * drops the true count and the noise (the release path). */
  def dpCounts(frame: DataFrame, withTrue: Boolean = true): DataFrame = {
    val keys = frame.columns.toSeq
    require(keys.nonEmpty, "need at least one group-key column")
    // note: the noise seed concatenates key values with '|' — two DISTINCT
    // key tuples whose concatenations collide (a value containing the
    // separator) draw the SAME noise; groups stay separate, only their
    // draws correlate. A production swap to per-release CSPRNG draws (the
    // registry-comment caveat) removes the concern entirely.
    val (_, fpE) = hllIdExprs("h")
    val released = frame
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("true_n")) // the ONLY shuffle
      .withColumn("h",
        expr(s"graft_polyhash(concat_ws('|', ${keys.mkString(", ")}))"))
      .withColumn("u", expr(s"(${hllVExpr(fpE)}) % 3221225470L"))
      .withColumn("noise", expr(geometricNoiseExpr("u")))
      .selectExpr(keys ++ Seq("true_n", "noise",
        "greatest(true_n + noise, 0L) AS released"): _*)
    val out = if (withTrue) released
      else released.selectExpr(keys :+ "released": _*)
    Sorted.byNames(out, keys.head, keys.tail: _*)
  }

  /** DP quantile release of a non-negative int64 `valueCol` via the
    * noisy-histogram mechanism — see the `dp_quantiles` registry comment
    * for the privacy argument (eps = ln 2 geometric noise per HDR
    * bucket; the quantile read is post-processing). `withTrue = false`
    * drops the true columns (the release path). */
  def dpQuantiles(vals: DataFrame, valueCol: String, subBits: Int = 5,
      qsPm: Seq[Int] = Seq(500, 900, 990),
      withTrue: Boolean = true): DataFrame = {
    requireSketchKnobs(subBits, qsPm)
    val hist = vals
      .selectExpr(s"${hdrBucketExpr(valueCol, subBits)} AS bkt")
      .groupBy(col("bkt")).agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK) // feeds the noisy AND true readouts
    val (_, fpE) = hllIdExprs("h")
    val noisy = hist
      .withColumn("h", expr("graft_polyhash(CAST(bkt AS STRING))"))
      .withColumn("u", expr(s"(${hllVExpr(fpE)}) % 3221225470L"))
      .withColumn("noise", expr(geometricNoiseExpr("u")))
      .selectExpr("bkt", "cnt + noise AS cnt")
      .filter("cnt > 0")
    val rel = hdrQuantiles(noisy, Seq.empty, subBits, qsPm)
      .selectExpr("q_pm", "n AS released_n", "est_q AS released_q")
    if (!withTrue) Sorted.byNames(rel, "q_pm")
    else {
      val tru = hdrQuantiles(hist, Seq.empty, subBits, qsPm)
        .selectExpr("q_pm", "n AS true_n", "est_q AS true_q")
      // left join: an (unrealistically tiny) corpus whose noisy histogram
      // empties must read released 0, never drop the quantile row
      Sorted.byNames(tru.join(rel, Seq("q_pm"), "left")
        .selectExpr("q_pm", "true_n", "true_q",
          "coalesce(released_n, 0L) AS released_n",
          "coalesce(released_q, 0L) AS released_q"), "q_pm")
    }
  }

  /** HDR/base-2 bucket id of a non-negative int64 `x` expression —
    * monotone in x, relative error <= 2^-subBits, exact identity below
    * 2^subBits. See the `quantile_sketch` registry comment. ONE
    * definition for the batch sketch and the streaming twin. */
  private[graft] def hdrBucketExpr(x: String, subBits: Int): String = {
    val base = 1L << subBits
    val e = s"(length(conv($x, 10, 2)) - 1)"
    s"CASE WHEN $x < ${base}L THEN $x " +
      s"ELSE CAST($e - $subBits AS BIGINT) * ${base}L + shiftright($x, $e - $subBits) END"
  }

  /** Lower bound of HDR bucket `id` — the quantile estimate read. */
  private[graft] def hdrRepExpr(id: String, subBits: Int): String = {
    val base = 1L << subBits
    s"CASE WHEN $id < ${base}L THEN $id " +
      s"ELSE shiftleft(($id % ${base}L) + ${base}L, CAST($id div ${base}L AS INT) - 1) END"
  }

  /** Quantile estimates from an (grp..., bkt, cnt) histogram frame — the
    * readout fold shared by the batch sketch and the streaming twin.
    * Output: (grp..., q_pm, n, est_q), one row per group x quantile. The
    * windows run over the BUCKET DOMAIN (<= ~(64 - b)*2^b rows per
    * group), never corpus rows. */
  private[graft] def hdrQuantiles(hist: DataFrame, grp: Seq[String],
      subBits: Int, qsPm: Seq[Int]): DataFrame = {
    val wn = Window.partitionBy(grp.map(col): _*)
    val wc = Window.partitionBy(grp.map(col): _*).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("n", sum(col("cnt")).over(wn))
      .withColumn("cum", sum(col("cnt")).over(wc))
      .withColumn("q_pm", explode(array(qsPm.map(lit): _*)))
      .where(expr("cum >= (q_pm * n + 999) div 1000")) // type-1 rank: ceil(q*n/1000)
      .groupBy((grp ++ Seq("q_pm", "n")).map(col): _*)
      .agg(min(col("bkt")).as("qb"))
      .selectExpr(grp ++ Seq("q_pm", "n",
        s"${hdrRepExpr("qb", subBits)} AS est_q"): _*)
  }

  /** Mergeable quantile sketch + calibration over a group-key + value
    * frame — every column EXCEPT `valueCol` is part of the group key
    * (the kAnonymityProfile contract); `valueCol` must be a NON-NEGATIVE
    * int64 (quantize first — the cents contract). See the
    * `quantile_sketch` registry comment for geometry and scale shape.
    * `withExact = false` drops the exact percentile columns and their
    * value-distribution shuffle (the 100 TB path). */
  /** Benford's-law first-digit probabilities, ppm. log10(1 + 1/d) is
    * transcendental, so the nine values are the published constants
    * rounded offline by largest remainder to sum to EXACTLY 1e6 (the
    * hllAlphaPpm discipline) — the TVD against them is then a clean
    * per-mille-of-mass statistic. */
  // lazy: the defs ListMap at the top of this object embeds
  // benfordCaseSql in its oracle SQL during object init, which runs
  // BEFORE later plain vals are assigned
  private[graft] lazy val benfordExpPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** `CASE d ... END` mapping a digit expression to its Benford ppm —
    * ONE definition embedded in both the Spark plan and the DuckDB
    * oracle so the constants cannot desynchronize (plain int literals:
    * both engines widen them against the int64 observed side). */
  private[graft] def benfordCaseSql(d: String): String =
    benfordExpPpm.map { case (dig, ppm) => s"WHEN $d = $dig THEN $ppm" }
      .mkString("CASE ", " ", " ELSE 0 END")

  /** First-digit Benford deviation screen over a group-key + value frame
    * — every column EXCEPT `valueCol` is part of the group key (the
    * kAnonymityProfile contract); `valueCol` must be int64 (quantize
    * first — the cents contract; rows <= 0 are outside Benford's domain
    * and are EXCLUDED, with n reporting what was screened). Per group:
    * TVD between the observed first-digit distribution and Benford's,
    * in ppm; `suspicious` flags groups above `flagTvdPpm`. The screen
    * READS as: naturally-grown multiplicative quantities (revenues,
    * populations) follow Benford; fabricated or uniform-generated ones
    * don't — TPC-H's uniform prices fail it loudly, which is the point.
    * Scale shape: the (group, digit) count is the ONLY corpus-volume
    * shuffle (combiner-perfect, <= 9 rows per group per task); the
    * 9-digit expected frame broadcasts into the group domain so ABSENT
    * digits still contribute their expected mass to the TVD. */
  def benfordScreen(vals: DataFrame, valueCol: String,
      flagTvdPpm: Long = 50000L): DataFrame = {
    require(flagTvdPpm > 0 && flagTvdPpm <= 1000000L,
      s"flagTvdPpm must be in (0, 1e6], got $flagTvdPpm")
    require(vals.columns.contains(valueCol),
      s"value column $valueCol not in ${vals.columns.mkString(",")}")
    val grp = vals.columns.filterNot(_ == valueCol).toSeq
    require(grp.nonEmpty, "need at least one group column")
    // first digit via the decimal string head: pure string algebra, no
    // float pow/log10, identical in both engines for positive int64
    val dig = vals
      .where(col(valueCol) > 0L)
      .selectExpr(grp :+
        s"CAST(substring(CAST($valueCol AS STRING), 1, 1) AS BIGINT) AS d": _*)
      .groupBy((grp :+ "d").map(col): _*)
      .agg(count(lit(1)).as("c")) // the ONLY corpus-volume shuffle
    benfordReadout(dig, grp, flagTvdPpm)
      .transform(Sorted.byNames(_, grp.head, grp.tail: _*))
  }

  /** The TVD-vs-Benford readout over a `(grp..., d, c)` digit-count frame
    * — ONE definition for the batch screen and the streaming monitor
    * (the chi2Readout sharing discipline). `grp` may be empty (the
    * streaming global lane). */
  private[graft] def benfordReadout(dig: DataFrame, grp: Seq[String],
      flagTvdPpm: Long): DataFrame = {
    val nFrame = (if (grp.isEmpty) dig.groupBy() else dig.groupBy(grp.map(col): _*))
      .agg(sum(col("c")).as("n"))
    val digits = dig.sparkSession.range(1L, 10L)
      .selectExpr("id AS d", s"${benfordCaseSql("id")} AS exp_ppm")
    val joined = nFrame
      .crossJoin(broadcast(digits))
      .join(dig, grp :+ "d", "left")
      .selectExpr(grp ++ Seq("n",
        // DECIMAL staging: c * 1e6 passes 2^63 once group counts reach
        // ~9e12 rows (the ab_test IntegralDivide rule); the quotient is
        // ppm-bounded so the int64 result can't wrap
        "abs(CAST(coalesce(c, 0L) AS DECIMAL(38,0)) * 1000000 div n - exp_ppm) AS dev"): _*)
    (if (grp.isEmpty) joined.groupBy(col("n"))
     else joined.groupBy((grp :+ "n").map(col): _*))
      .agg(expr("sum(dev) div 2").as("tvd_ppm"))
      .selectExpr(grp ++ Seq("n", "tvd_ppm",
        s"CAST(tvd_ppm >= ${flagTvdPpm}L AS INT) AS suspicious"): _*)
  }

  /** The sketch-knob contract shared by the batch operator and the
    * streaming twin — loud before any plan is built. */
  private[graft] def requireSketchKnobs(subBits: Int, qsPm: Seq[Int]): Unit = {
    require(subBits >= 1 && subBits <= 16, s"subBits must be in [1, 16], got $subBits")
    require(qsPm.nonEmpty && qsPm.forall(q => q >= 1 && q <= 1000),
      s"quantiles are per-mille in [1, 1000], got $qsPm")
    require(qsPm == qsPm.sorted && qsPm.distinct == qsPm,
      s"quantiles must be ascending and distinct, got $qsPm")
  }

  /** EXACT type-1 per-mille percentiles per group, via the per-(group,
    * value) DISTRIBUTION — the ccnet cutoff trick, never a row_number
    * over corpus rows: one corpus-volume fold, then windows over the
    * value-distribution domain. Output (grp..., q_pm, exact_q). Shared
    * by quantile_sketch's calibration path and the MAD screen. */
  private[graft] def exactQuantilesByGroup(vals: DataFrame, valueCol: String,
      grp: Seq[String], qsPm: Seq[Int]): DataFrame = {
    val wn = Window.partitionBy(grp.map(col): _*)
    val wc = Window.partitionBy(grp.map(col): _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vals
      .groupBy((grp :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(wn))
      .withColumn("cum", sum(col("c")).over(wc))
      .withColumn("q_pm", explode(array(qsPm.map(lit): _*)))
      .where(expr("cum >= (q_pm * n + 999) div 1000")) // type-1: ceil(q*n/1000)
      .groupBy((grp :+ "q_pm").map(col): _*)
      .agg(min(col(valueCol)).as("exact_q"))
  }

  def quantileSketch(vals: DataFrame, valueCol: String, subBits: Int = 5,
      qsPm: Seq[Int] = Seq(500, 900, 990), withExact: Boolean = true): DataFrame = {
    requireSketchKnobs(subBits, qsPm)
    require(vals.columns.contains(valueCol),
      s"value column $valueCol not in ${vals.columns.mkString(",")}")
    val grp = vals.columns.filterNot(_ == valueCol).toSeq
    require(grp.nonEmpty, "need at least one group column")
    // the ONLY corpus-volume shuffle of the sketch path: combiner-perfect
    // (<= bucket-domain rows per map task)
    val hist = vals
      .selectExpr(grp :+ s"${hdrBucketExpr(valueCol, subBits)} AS bkt": _*)
      .groupBy((grp :+ "bkt").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val est = hdrQuantiles(hist, grp, subBits, qsPm)
    if (!withExact)
      return Sorted.byNames(est, grp.head, (grp.tail :+ "q_pm"): _*)
    val exact = exactQuantilesByGroup(vals, valueCol, grp, qsPm)
    val out = est.join(exact, grp :+ "q_pm")
      .selectExpr(grp ++ Seq("q_pm", "n", "est_q", "exact_q",
        // DECIMAL staging: |est - exact| * 1e6 can pass 2^63 at full
        // int64 magnitudes; the quotient lands in [0, 1e6]
        """CASE WHEN exact_q = 0 THEN 0L
          |     ELSE (CAST(abs(est_q - exact_q) AS DECIMAL(38,0)) * 1000000)
          |          div exact_q END AS err_ppm""".stripMargin): _*)
    Sorted.byNames(out, grp.head, (grp.tail :+ "q_pm"): _*)
  }

  /** Robust (median/MAD) outlier profile over a group-key + value frame
    * — every column EXCEPT `valueCol` is part of the group key (the
    * kAnonymityProfile contract). A row is an outlier iff
    * |x − median| · 1000 > kMilli · MAD, all exact integers (the
    * comparison stages in DECIMAL(38,0) — no division, no float
    * 1.4826 consistency constant: kMilli ABSORBS it, e.g. kMilli = 4448
    * ≈ 3σ for normal data). MAD = 0 (over half the group at the median)
    * makes EVERY deviant an outlier — the textbook degenerate case,
    * deliberate and documented. See the `mad_outliers` registry comment
    * for the scale shape. */
  def madOutliers(vals: DataFrame, valueCol: String,
      kMilli: Long = 5000L): DataFrame = {
    require(kMilli > 0, s"kMilli must be positive, got $kMilli")
    require(vals.columns.contains(valueCol),
      s"value column $valueCol not in ${vals.columns.mkString(",")}")
    val grp = vals.columns.filterNot(_ == valueCol).toSeq
    require(grp.nonEmpty, "need at least one group column")
    // persisted: the group-domain median frame feeds the deviation
    // projection AND (through it) the MAD distribution pass AND the final
    // profile — without this its corpus-volume distribution subplan
    // re-executes once per consumer (the assortativity dead-cache rule:
    // persist only what multiple ACTIONS actually read)
    val med = exactQuantilesByGroup(vals, valueCol, grp, Seq(500))
      .selectExpr(grp :+ "exact_q AS med": _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dev = vals.join(broadcast(med), grp)
      .selectExpr(grp ++ Seq("med", s"abs($valueCol - med) AS adev"): _*)
    val mad = exactQuantilesByGroup(dev.selectExpr(grp :+ "adev": _*),
      "adev", grp, Seq(500))
      .selectExpr(grp :+ "exact_q AS mad": _*)
    dev.join(broadcast(mad), grp)
      .groupBy((grp ++ Seq("med", "mad")).map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(CAST(adev AS DECIMAL(38,0)) * 1000 > " +
          s"$kMilli * CAST(mad AS DECIMAL(38,0)) AS INT)")).as("n_outliers"))
      .selectExpr(grp ++ Seq("n", "med", "mad", "n_outliers",
        // DECIMAL staging for the rate: n_outliers * 1e6 wraps past ~9e12
        "CAST(n_outliers AS DECIMAL(38,0)) * 1000000 div n AS outlier_ppm"): _*)
      .transform(Sorted.byNames(_, grp.head, grp.tail: _*))
  }

  /** `m`-register contract shared by every HLL surface: power-of-two,
    * >= 16, and the rho cap for an all-zero remainder — sized so the
    * all-empty register sum m * 2^cap = 2^62 never overflows int64. */
  private[graft] def hllCap(m: Int): Int = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    62 - (63 - java.lang.Long.numberOfLeadingZeros(m.toLong))
  }

  /** Map-side register algebra over an int64 `fp` expression: the P61 mix
    * to `v`. ONE definition for the batch census and the streaming UV
    * sketch (the chi2Readout sharing discipline). */
  private[graft] def hllVExpr(fp: String): String = {
    import graft.functions.Portable.{MIX, MIX2, P61}
    s"((($fp % 2147483648L) * ${MIX}L) % ${P61}L" +
      s" + (($fp div 2147483648L) * ${MIX2}L) % ${P61}L) % ${P61}L"
  }

  /** Trailing-zero rank of the remainder bits via the exact binary-string
    * length of the lowest set bit (w & -w): conv/bin agree on
    * minimal-length binary of a positive int64 — no float log anywhere. */
  private[graft] def hllRhoExpr(v: String, m: Int): String = {
    val cap = hllCap(m)
    s"CASE WHEN $v div ${m}L = 0 THEN $cap" +
      s" ELSE length(conv(($v div ${m}L) & -($v div ${m}L), 10, 2)) END"
  }

  /** Raw-int64 pre-hash for HLL over ID-like columns, as (h2Expr, fpExpr).
    * Sequential ids are lattice-structured and every affine map mod a
    * prime PRESERVES the lattice — a single linear mix measured +83%
    * estimate error on 1..900. Two independent MID-SQUARE chains
    * (x² mod P is non-linear; every product stays < 2^63) build the
    * paired 60-bit fp; the register INDEX reads the second chain
    * directly (`h2 % m`) so index occupancy is decoupled from the rho
    * source (measured Poisson-clean loads where `v % m` left a quarter
    * of the registers empty). Content-hash inputs (the trigram census)
    * don't need this — their fps are already wide. */
  private[graft] def hllIdExprs(id: String): (String, String) = {
    import graft.functions.Portable.{MIX, MIX2, P, P2}
    val h1 = s"((((($id % ${P}L) * ($id % ${P}L)) % ${P}L) * ${MIX}L + ($id % ${P}L)) % ${P}L)"
    val h2 = s"((((($id % ${P2}L) * ($id % ${P2}L)) % ${P2}L) * ${MIX2}L + ($id % ${P2}L)) % ${P2}L)"
    (h2, s"($h1 * 2147483648L + $h2)")
  }

  /** The exact-integer harmonic estimate over an `(byCols..., idx, mj)`
    * register frame — the final fold shared by batch and streaming. A
    * ZERO-row frame (streaming batch 0 before any data) means "nothing
    * seen": est_distinct = 0 with all m registers empty — never the raw
    * estimator's alpha-bias floor, and never a NULL that would kill a
    * streaming query (the batch census can't hit this: its groups exist
    * only where rows do). */
  private[graft] def hllEstimate(regs: DataFrame, m: Int,
      byCols: Seq[String]): DataFrame = {
    val cap = hllCap(m)
    val alphaPpm = hllAlphaPpm(m)
    val g = if (byCols.isEmpty) regs.groupBy()
      else regs.groupBy(byCols.map(col): _*)
    g.agg(coalesce(sum(expr(s"shiftleft(1L, $cap - mj)")), lit(0L)).as("s_part"),
        count(lit(1)).as("n_regs"))
      .selectExpr(byCols ++ Seq("n_regs", s"${m}L - n_regs AS zero_registers",
        s"s_part + (${m}L - n_regs) * shiftleft(1L, $cap) AS s_scaled"): _*)
      .selectExpr(byCols ++ Seq("zero_registers",
        s"CASE WHEN n_regs = 0 THEN 0L" +
          s" ELSE CAST(CAST(${alphaPpm}L AS DECIMAL(38,0)) * ${m.toLong * m}L" +
          s" * shiftleft(1L, $cap) div (CAST(s_scaled AS DECIMAL(38,0)) * 1000000L)" +
          " AS BIGINT) END AS est_distinct"): _*)
  }

  /** Per-source HLL distinct-trigram estimate — see the `hll_distinct`
    * registry comment for the sketch, parity and calibration contracts.
    * `m` (power of two >= 16) is the register count / accuracy knob;
    * `withExact = false` drops the exact-distinct columns and their
    * corpus-volume distinct shuffle — the sketch-only 100 TB path
    * (schema: source, est_distinct, zero_registers). */
  /** The (source, fp) trigram-fingerprint stream shared by the HLL census
    * and the overlap sketch: one tokenize+hash pass, paired 60-bit fps. */
  private def triFps(docs: DataFrame): DataFrame = {
    graft.functions.HashExpressions.register(docs.sparkSession)
    import graft.functions.Portable.{MIX, MIX2, P, P2}
    def at(off: Int) = s"element_at(th, i - $off)"
    val tri = s"CASE WHEN size(th) >= 3 THEN transform(sequence(3, size(th)), " +
      s"i -> ((((${at(2)} * ${MIX}L + ${at(1)}) % ${P}L) * ${MIX}L + ${at(0)}) % ${P}L) * 2147483648L" +
      s" + (((${at(2)} * ${MIX2}L + ${at(1)}) % ${P2}L) * ${MIX2}L + ${at(0)}) % ${P2}L)" +
      s" ELSE CAST(array() AS array<bigint>) END"
    docs
      .select(col("source"), expr("graft_token_hashes(text)").as("th"))
      .select(col("source"), explode(expr(tri)).as("fp"))
  }

  /** The per-source register fold over a (source, fp) stream — the ONE
    * corpus-volume reduction of every HLL surface here (combiner-perfect
    * max merge; each map task ships <= m rows per source). */
  private def hllRegs(fps: DataFrame, m: Int): DataFrame = fps
    .selectExpr("source", s"${hllVExpr("fp")} AS v")
    .selectExpr("source", s"v % ${m}L AS idx", s"${hllRhoExpr("v", m)} AS rho")
    .groupBy(col("source"), col("idx")).agg(max(col("rho")).as("mj"))

  def hllDistinct(docs: DataFrame, m: Int = 256,
      withExact: Boolean = true): DataFrame = {
    hllCap(m)
    val fps = triFps(docs)
    val fed = if (withExact) fps.persist(StorageLevel.MEMORY_AND_DISK) else fps
    val regs = hllRegs(fed, m)
    val est = hllEstimate(regs, m, Seq("source"))
    if (!withExact)
      return est.select(col("source"), col("est_distinct"), col("zero_registers"))
        .transform(Sorted.byNames(_, "source"))
    val exact = fed.select(col("source"), col("fp")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("exact_distinct"))
    est.join(exact, "source")
      .selectExpr("source", "est_distinct", "exact_distinct",
        "abs(est_distinct - exact_distinct) * 1000000L div exact_distinct AS abs_err_ppm",
        "zero_registers")
      .transform(Sorted.byNames(_, "source"))
  }

  /** Pairwise cross-source overlap ESTIMATES from the same per-source HLL
    * register tables hllDistinct builds — see the `hll_overlap` registry
    * comment. Sketch algebra: the union of two sources' registers is the
    * per-index MAX (HLL's mergeability), and the intersection comes from
    * inclusion–exclusion est(A) + est(B) − est(A∪B), clamped at 0 (the
    * estimator difference can undershoot). `withExact = true` adds the
    * exact distinct-fp intersection per pair (a corpus-volume distinct +
    * self-join — the calibration read); `false` is the sketch-only path
    * whose pair expansion touches REGISTER rows only. */
  def hllOverlap(docs: DataFrame, m: Int = 256,
      withExact: Boolean = true): DataFrame = {
    hllCap(m)
    val fps = triFps(docs)
    val fed = if (withExact) fps.persist(StorageLevel.MEMORY_AND_DISK) else fps
    // <= |sources| * m rows from here down: everything pair-shaped is
    // sketch-sized, never corpus-sized
    val regs = hllRegs(fed, m).persist(StorageLevel.MEMORY_AND_DISK)
    val est = hllEstimate(regs, m, Seq("source"))
      .select(col("source"), col("est_distinct"))
    val srcs = regs.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("src_a"))
      .join(srcs.select(col("source").as("src_b")), expr("src_a < src_b"))
    val unionRegs = pairs
      .join(regs, col("source") === col("src_a") || col("source") === col("src_b"))
      .groupBy(col("src_a"), col("src_b"), col("idx"))
      .agg(max(col("mj")).as("mj"))
    val estU = hllEstimate(unionRegs, m, Seq("src_a", "src_b"))
      .select(col("src_a"), col("src_b"), col("est_distinct").as("est_union"))
    val out = estU
      .join(est.withColumnRenamed("source", "src_a")
        .withColumnRenamed("est_distinct", "est_a"), "src_a")
      .join(est.withColumnRenamed("source", "src_b")
        .withColumnRenamed("est_distinct", "est_b"), "src_b")
      .selectExpr("src_a", "src_b", "est_a", "est_b", "est_union",
        "greatest(0L, est_a + est_b - est_union) AS est_intersect")
      .selectExpr("src_a", "src_b", "est_a", "est_b", "est_union",
        "est_intersect",
        "CASE WHEN est_union > 0 THEN est_intersect * 1000000L div est_union" +
          " ELSE 0L END AS jaccard_ppm")
    if (!withExact)
      return out.transform(Sorted.byNames(_, "src_a", "src_b"))
    val ex = fed.select(col("source"), col("fp")).distinct()
    val exact = ex.alias("a")
      .join(ex.alias("b"), expr("a.fp = b.fp AND a.source < b.source"))
      .selectExpr("a.source AS src_a", "b.source AS src_b")
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("exact_intersect"))
    out.join(exact, Seq("src_a", "src_b"), "left")
      .selectExpr("src_a", "src_b", "est_a", "est_b", "est_union",
        "est_intersect", "COALESCE(exact_intersect, 0L) AS exact_intersect",
        "jaccard_ppm")
      .transform(Sorted.byNames(_, "src_a", "src_b"))
  }

  /** Per-source distinct-n diversity — see the `corpus_diversity`
    * registry comment. Scale shape: ONE tokenize+hash pass emits the
    * (source, n, fingerprint) stream via a single concat of three
    * in-array transforms (never three scans of the corpus); the only
    * corpus-volume shuffle is the (source, n, fp) hash-group — the same
    * family as ngram_top_corpus, with map-side combining collapsing
    * every within-partition repeat — and the final per-(source, n) fold
    * is |sources|×3 groups. Exact distinct is the oracle-able contract;
    * at the extreme tail swap the second stage for
    * approx_count_distinct (HLL, mergeable partial+final) and drop the
    * oracle row — documented knob, not the default. */
  def corpusDiversity(docs: DataFrame): DataFrame = {
    graft.functions.HashExpressions.register(docs.sparkSession)
    import graft.functions.Portable.{MIX, MIX2, P, P2}
    val empty = "CAST(array() AS array<struct<n: int, fp: bigint>>)"
    def at(off: Int) = s"element_at(th, i - $off)"
    val one = s"transform(th, x -> struct(1 AS n, " +
      s"x * 2147483648L + (x * ${MIX2}L) % ${P2}L AS fp))"
    val two = s"CASE WHEN size(th) >= 2 THEN transform(sequence(2, size(th)), " +
      s"i -> struct(2 AS n, ((${at(1)} * ${MIX}L + ${at(0)}) % ${P}L) * 2147483648L" +
      s" + (${at(1)} * ${MIX2}L + ${at(0)}) % ${P2}L AS fp)) ELSE $empty END"
    val three = s"CASE WHEN size(th) >= 3 THEN transform(sequence(3, size(th)), " +
      s"i -> struct(3 AS n, ((((${at(2)} * ${MIX}L + ${at(1)}) % ${P}L) * ${MIX}L + ${at(0)}) % ${P}L) * 2147483648L" +
      s" + (((${at(2)} * ${MIX2}L + ${at(1)}) % ${P2}L) * ${MIX2}L + ${at(0)}) % ${P2}L AS fp)) ELSE $empty END"
    docs
      .select(col("source"), expr("graft_token_hashes(text)").as("th"))
      .select(col("source"), explode(expr(s"concat($one, $two, $three)")).as("g"))
      .select(col("source"), col("g.n").as("n"), col("g.fp").as("fp"))
      .groupBy(col("source"), col("n"), col("fp"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"), col("n"))
      .agg(sum(col("c")).as("total_ngrams"), count(lit(1)).as("distinct_ngrams"))
      .selectExpr("source", "n", "total_ngrams", "distinct_ngrams",
        "distinct_ngrams * 1000000L div total_ngrams AS distinct_ppm")
      .transform(Sorted.byNames(_, "source", "n"))
  }

  /** The hashed-bigram feature explosion shared by the classifier pair:
    * one tokenize+hash pass into slim (doc_id, lang, bkt) rows.
    * `carryCols` threads extra per-document columns (e.g. `source`)
    * through — the lmTrigramScore carry pattern, so a domain-keyed
    * consumer (mix_doremi) never needs a corpus-sized join-back. */
  private def hashedFeatures(docs: DataFrame,
      carryCols: Seq[String] = Nil): DataFrame = {
    graft.functions.HashExpressions.register(docs.sparkSession)
    val carry = carryCols.map(col)
    docs
      .select(col("doc_id") +: col("lang") +: carry :+
        expr("graft_token_hashes(text)").as("th"): _*)
      .select(col("doc_id") +: col("lang") +: carry :+
        explode(expr(bigramBktExpr)).as("bkt"): _*)
  }

  /** Train the fastText-shaped hashed linear quality classifier: given a
    * LABELED train frame (`posExpr` marks the positive class — curated
    * corpus, target language, human-rated "good"), return the FULL
    * B = 8192-row weight table `(bkt, w)` with
    * `w = (pc+1)·1e9 div (ptot+B) − (nc+1)·1e9 div (ntot+B)` — the
    * Laplace-smoothed class-conditional bucket-frequency difference in
    * ppb. The generated bucket domain guarantees exactly B rows (unseen
    * buckets carry the smoothing-only weight), so the scoring join never
    * loses a feature and the broadcast can never outgrow the threshold.
    * Closed-form training = one pass over the train split: two
    * combiner-perfect ≤ B-group counts; no iterative driver loop. */
  def trainHashedClassifier(train: DataFrame, posExpr: String): DataFrame = {
    val f = hashedFeatures(train)
      .withColumn("is_pos", expr(s"IF($posExpr, 1L, 0L)"))
    val counts = f.groupBy(col("bkt"))
      .agg(sum(col("is_pos")).as("pc"), sum(expr("1L - is_pos")).as("nc"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tots = counts.agg(
      coalesce(sum(col("pc")), lit(0L)).as("ptot"),
      coalesce(sum(col("nc")), lit(0L)).as("ntot"))
    train.sparkSession.range(0, 8192).toDF("bkt")
      .join(counts, Seq("bkt"), "left")
      .crossJoin(broadcast(tots))
      .selectExpr("bkt",
        "((coalesce(pc, 0L) + 1L) * 1000000000L) div (ptot + 8192L) " +
          "- ((coalesce(nc, 0L) + 1L) * 1000000000L) div (ntot + 8192L) AS w")
  }

  /** Score a corpus with a trained weight table and gate on the mean
    * feature weight: `score_ppb = Σ w(bkt) div n_bigrams` (trunc-toward-
    * zero in BOTH engines), `keep = score_ppb > thresholdPpb`. The weight
    * table BROADCASTS (≤ B rows by construction); scoring is one
    * tokenize+hash pass plus a partial+final per-doc sum — map-side
    * bounded regardless of corpus size. Docs with < 2 tokens have no
    * features and drop, same contract as importance_hashed. */
  /** Threshold-free ranking quality of a scored frame: exact-integer AUC
    * via the Mann–Whitney rank-sum identity with MIDRANKS for ties
    * (AUC = P(score_pos > score_neg) + ½·P(tie) — the probabilistic
    * definition, computed without sampling). The per-score (cnt, pos)
    * distribution is the only corpus-volume fold; doubled midranks keep
    * everything integer (2·mid = 2·cum_prev + cnt + 1), and the closed
    * form folds to ONE row: auc_ppm = (S2 − np(np+1))·10⁶ / (2·np·nn)
    * staged in DECIMAL(38,0). The single rank window runs over the score
    * DISTRIBUTION (the ccnet_buckets rule — never corpus rows; if the
    * distinct-score domain outgrows a task, coarsen the score
    * quantization, the same documented knob). A single-class frame reads
    * auc_ppm = 0 by guard — undefined, never a division error.
    * `labelExpr` is a SQL boolean over the scored columns (the
    * classifierEval contract); gini_ppm = 2·auc − 10⁶ ships alongside. */
  def classifierAuc(scored: DataFrame, labelExpr: String,
      scoreCol: String = "score_ppb"): DataFrame = {
    require(scored.columns.contains(scoreCol),
      s"score column $scoreCol not in ${scored.columns.mkString(",")}")
    val g = scored
      .selectExpr(s"$scoreCol AS s",
        s"CAST(CAST($labelExpr AS BOOLEAN) AS BIGINT) AS y")
      .groupBy(col("s"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos")) // the ONLY corpus fold
    val wc = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cp", coalesce(sum(col("cnt")).over(wc), lit(0L)))
      .agg(
        sum(expr("CAST(pos AS DECIMAL(38,0)) * (2 * cp + cnt + 1)")).as("s2"),
        coalesce(sum(col("pos")), lit(0L)).as("np"),
        coalesce(sum(col("cnt")), lit(0L)).as("n"))
      .selectExpr("n", "np AS n_pos", "n - np AS n_neg",
        """CASE WHEN np = 0 OR n - np = 0 THEN 0L
          |     ELSE (s2 - CAST(np AS DECIMAL(38,0)) * (np + 1)) * 1000000
          |          div (2 * CAST(np AS DECIMAL(38,0)) * (n - np)) END
          |  AS auc_ppm""".stripMargin)
      .selectExpr("n", "n_pos", "n_neg", "auc_ppm",
        "2 * auc_ppm - 1000000 AS gini_ppm")
  }

  /** Decile gains/lift table of a scored frame — the targeting read
    * beside classifierAuc's single ranking number: per score-decile
    * (1 = best scores), volume, positives, positive rate, lift vs the
    * base rate, and the cumulative capture curve ("the top 20% of scores
    * hold X% of the positives"). Deciles come from the per-score
    * DISTRIBUTION cumulative (the ccnet/rfm cutoff trick — never a
    * row_number over corpus rows): a tie group spanning descending ranks
    * (cum_prev, cum] takes the decile of its FIRST rank, so equal scores
    * NEVER split across deciles (the rfm rule) and deciles can be
    * uneven under heavy ties — deliberate. Exact integers: lift_milli =
    * pos_d·n·1000 / (n_d·np) staged in DECIMAL(38,0); a frame with no
    * positives reads lift 0 by guard. One corpus-volume fold; the decile
    * fold and the cumulative-capture window run over the <= buckets-row
    * frame. */
  def classifierLift(scored: DataFrame, labelExpr: String,
      scoreCol: String = "score_ppb", buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 1000,
      s"buckets must be in [2, 1000], got $buckets")
    require(scored.columns.contains(scoreCol),
      s"score column $scoreCol not in ${scored.columns.mkString(",")}")
    val dist = scored
      .selectExpr(s"$scoreCol AS s",
        s"CAST(CAST($labelExpr AS BOOLEAN) AS BIGINT) AS y")
      .groupBy(col("s"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos")) // the ONLY corpus fold
    val wn = Window.partitionBy()
    val wc = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val perDecile = dist
      .withColumn("n", sum(col("cnt")).over(wn))
      .withColumn("np", sum(col("pos")).over(wn))
      .withColumn("cp", coalesce(sum(col("cnt")).over(wc), lit(0L)))
      // first descending rank of the tie group decides its decile
      .selectExpr("cnt", "pos", "n", "np",
        s"(CAST(cp AS DECIMAL(38,0)) * $buckets) div n + 1L AS decile")
      .groupBy(col("decile"), col("n"), col("np"))
      .agg(sum(col("cnt")).as("n_d"), sum(col("pos")).as("pos_d"))
    perDecile
      .withColumn("cum_pos", sum(col("pos_d")).over(
        Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .selectExpr("decile", "n_d AS n", "pos_d AS n_pos",
        "pos_d * 1000 div n_d AS rate_pm",
        """CASE WHEN np = 0 THEN 0L
          |     ELSE (CAST(pos_d AS DECIMAL(38,0)) * n * 1000)
          |          div (CAST(n_d AS DECIMAL(38,0)) * np) END AS lift_milli""".stripMargin,
        """CASE WHEN np = 0 THEN 0L
          |     ELSE cum_pos * 1000 div np END AS cum_capture_pm""".stripMargin)
      .transform(Sorted.byNames(_, "decile"))
  }

  /** Confident-Learning label-noise flags over a scored+labeled frame —
    * see the `label_noise_detect` registry comment for the thresholds,
    * the suspect rule and the single-class guard. `labelExpr` is a SQL
    * boolean over the scored columns (the classifierEval contract). */
  def labelNoiseDetect(scored: DataFrame, labelExpr: String,
      scoreCol: String = "score_ppb"): DataFrame = {
    require(scored.columns.contains(scoreCol),
      s"score column $scoreCol not in ${scored.columns.mkString(",")}")
    val lab = scored.selectExpr("doc_id", s"$scoreCol AS score_ppb",
        s"CAST(CAST($labelExpr AS BOOLEAN) AS INT) AS label")
      .persist(StorageLevel.MEMORY_AND_DISK) // feeds the threshold fold AND the flags
    val cut = lab.groupBy(col("label"))
      .agg(sum(col("score_ppb")).as("ss"), count(lit(1)).as("n"))
      .selectExpr("label", "ss div n AS t")
      .agg(max(expr("IF(label = 1, t, CAST(NULL AS BIGINT))")).as("t1"),
        max(expr("IF(label = 0, t, CAST(NULL AS BIGINT))")).as("t0"))
    lab.crossJoin(broadcast(cut))
      .selectExpr("doc_id", "label", "score_ppb",
        "CASE WHEN score_ppb >= t1 THEN 1 ELSE 0 END AS conf_pos",
        "CASE WHEN score_ppb <= t0 THEN 1 ELSE 0 END AS conf_neg",
        """CASE WHEN label = 1 AND score_ppb <= t0 THEN 1
          |     WHEN label = 0 AND score_ppb >= t1 THEN 1
          |     ELSE 0 END AS suspect""".stripMargin)
      .transform(Sorted.byNames(_, "doc_id"))
  }

  def hashedClassifierScore(docs: DataFrame, weights: DataFrame,
      thresholdPpb: Long = 0L, carryCols: Seq[String] = Nil): DataFrame =
    hashedFeatures(docs, carryCols)
      .join(broadcast(weights), "bkt")
      .groupBy(col("doc_id") +: col("lang") +: carryCols.map(col): _*)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("w")).as("sw"))
      .selectExpr(Seq("doc_id", "lang") ++ carryCols ++ Seq("n_bigrams",
        "sw div n_bigrams AS score_ppb",
        s"IF(sw div n_bigrams > ${thresholdPpb}L, 1, 0) AS keep"): _*)
      .transform(Sorted.byNames(_, "doc_id"))
}
