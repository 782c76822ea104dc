package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.collection.immutable.ListMap

/** Retrieval scoring over the corpus: BM25 lexical ranking and
  * reciprocal-rank fusion of two rankings — the query side of a
  * training-data pipeline (mining relevant documents, hybrid
  * lexical+vector retrieval). The reference has no search layer; these
  * extend the engine the same way the dedup/ANN family does.
  *
  * Cross-engine float parity (QueryDef rules): BM25's idf is the RATIONAL
  * form (N - df + 0.5)/(df + 0.5) — the classic log() around it is a
  * transcendental whose libm results differ across engines. NOTE the
  * substitution is monotone PER TERM but the multi-term SUM is not
  * ranking-equivalent to log-idf BM25 (a very rare term's untamed
  * rational idf can outvote several moderate log-idfs): what this
  * operator pins — on both engines identically — is the rational-idf
  * variant itself, chosen for bit-exact cross-engine parity. Every
  * double step is a single IEEE op in the same parenthesization as the
  * oracle SQL.
  */
object Retrieval {

  /** BM25 free parameters (Robertson et al.; k1 in [1.2, 2.0], b = 0.75). */
  private val K1 = "1.2D"
  private val B75 = "0.75D"

  /** The fixed query terms (high-df corpus vocabulary, so tf/dl dominate). */
  private val Terms = Seq("spark", "join", "window")

  /** Spark-side per-term score; identical shape in [[duckScore]]. */
  private def score(i: Int): String =
    s"""((CAST(n - df$i AS DOUBLE) + 0.5D) / (CAST(df$i AS DOUBLE) + 0.5D))
       | * ((CAST(tf$i AS DOUBLE) * 2.2D)
       |    / (CAST(tf$i AS DOUBLE) + $K1 * ((1.0D - $B75) + $B75 * (CAST(dl AS DOUBLE) / avgdl))))""".stripMargin

  private def duckScore(i: Int): String =
    s"""((CAST(n - df$i AS DOUBLE) + 0.5::DOUBLE) / (CAST(df$i AS DOUBLE) + 0.5::DOUBLE))
       | * ((CAST(tf$i AS DOUBLE) * 2.2::DOUBLE)
       |    / (CAST(tf$i AS DOUBLE) + 1.2::DOUBLE * ((1.0::DOUBLE - 0.75::DOUBLE) + 0.75::DOUBLE * (CAST(dl AS DOUBLE) / avgdl))))""".stripMargin

  private val duckToks = Portable.duckToksSql("text")

  /** Left-assoc sum of the per-term score fragments — ONE builder for both
    * engines so adding a Terms entry can never silently drop out of the
    * score on one side (review find: the sum was hardcoded to 3 summands
    * while tf/df were Terms-driven). */
  private def sumChain(f: Int => String): String =
    Terms.indices.map(f).reduceLeft((a, b) => s"($a + $b)")

  /** Shared TopK udaf instance builder (bounded top-k per group — one
    * partial+final aggregation, ≤ k state per group; see
    * [[graft.functions.TopK]]). */
  private def topkUdaf(k: Int) =
    udaf(new graft.functions.TopK(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))

  val defs: ListMap[String, QueryDef] = ListMap(

    // ---- BM25 ranking: top-15 documents for a 3-term query ----------------
    // Scale shape: one pass tokenizes each doc into a SLIM per-doc stat row
    // (doc_id, dl, tf_i) — persisted so corpus stats and scoring both read
    // it; corpus stats reduce to ONE row (partial+final agg) broadcast back;
    // scoring is map-side; top-15 is TakeOrderedAndProject (≤ 15 rows per
    // map task reach the driver, no global sort). At 100 TB the stats row
    // is a metadata artifact refreshed per ingest, everything else streams.
    "bm25_rank" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val tfCols = Terms.zipWithIndex.map { case (t, i) =>
          s"size(filter(toks, t -> t = '$t')) AS tf$i"
        }
        val slim = d
          .selectExpr("doc_id", s"${Portable.tokensSql("text")} AS toks")
          .selectExpr(Seq("doc_id", "size(toks) AS dl") ++ tfCols: _*)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val aggCols =
          Seq(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")) ++
            Terms.indices.map { i =>
              expr(s"sum(CAST(tf$i > 0 AS BIGINT))").as(s"df$i")
            }
        val stats = slim
          .agg(aggCols.head, aggCols.tail: _*)
          .withColumn("avgdl", expr("CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)"))
        slim.crossJoin(broadcast(stats))
          .selectExpr("doc_id", "dl",
            s"${sumChain(score)} AS score")
          .filter(col("score") > 0d)
          .orderBy(col("score").desc, col("doc_id"))
          .limit(15)
      },
      s"""WITH slim AS (
         |  SELECT doc_id, len(toks) AS dl,
         |    ${Terms.zipWithIndex.map { case (t, i) =>
             s"len(list_filter(toks, x -> x = '$t')) AS tf$i" }.mkString(",\n         |    ")}
         |  FROM (SELECT doc_id, $duckToks AS toks FROM documents)),
         |stats AS (
         |  SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl,
         |    ${Terms.indices.map(i =>
             s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i").mkString(",\n         |    ")},
         |    CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
         |  FROM slim)
         |SELECT doc_id, dl,
         |  ${sumChain(duckScore)} AS score
         |FROM slim CROSS JOIN stats
         |WHERE ${sumChain(duckScore)} > 0
         |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin),

    // ---- reciprocal-rank fusion of a cosine ranking and a dot-product
    // ranking (the hybrid-retrieval merge step; Cormack et al.'s RRF with
    // the standard k = 60). Both source rankings come from the bounded
    // TopK aggregator (no windows, ≤ 20 state per query group); the fused
    // candidate set is ≤ 40 rows per query regardless of corpus size, so
    // the final top-5 runs on a bounded frame. rrf = 1/(60+rank_a) +
    // 1/(60+rank_b), missing list contributes 0 — single IEEE divisions
    // and one addition, same order as the oracle. ---------------------------
    "rank_fusion" -> QueryDef(
      (s, dir) => {
        graft.functions.HashExpressions.register(s)
        val emb = Tables.load(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 10)
          .selectExpr("vec_id AS q_id", "embedding AS q_emb")
        val dotSql =
          "aggregate(zip_with(q_emb, embedding, (x, y) -> double(x * y)), double(0), (a, b) -> a + b)"
        val scored = broadcast(q).join(emb, expr("vec_id != q_id"))
          .selectExpr("q_id", "vec_id",
            "graft_cosine(q_emb, embedding) AS cosine", s"$dotSql AS dot")
          .persist(StorageLevel.MEMORY_AND_DISK) // feeds BOTH rankings once
        def ranked(scoreCol: String, rankName: String): DataFrame =
          // NULL score drops BEFORE the udaf (the tuple encoder would decode
          // it as 0.0); NaN is dropped inside TopK. The oracle's ra/rb
          // subselects mirror both with NOT coalesce(isnan(..), TRUE).
          scored.filter(col(scoreCol).isNotNull)
            .groupBy(col("q_id"))
            .agg(topkUdaf(20)(col(scoreCol), col("vec_id")).as("top"))
            .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
            .select(col("q_id"), col("t._2").as("vec_id"),
              (col("pos") + 1).cast("long").as(rankName))
        val fused = ranked("cosine", "rank_a")
          .join(ranked("dot", "rank_b"), Seq("q_id", "vec_id"), "full_outer")
          .selectExpr("q_id", "vec_id",
            """coalesce(1.0D / (60.0D + CAST(rank_a AS DOUBLE)), 0.0D)
              | + coalesce(1.0D / (60.0D + CAST(rank_b AS DOUBLE)), 0.0D) AS rrf""".stripMargin)
        fused.groupBy(col("q_id"))
          .agg(topkUdaf(5)(col("rrf"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
          .select(col("q_id"), col("t._2").as("vec_id"),
            (col("pos") + 1).cast("int").as("rank"), col("t._1").as("rrf"))
          .orderBy("q_id", "rank")
      },
      {
        val dot =
          "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> (q_emb[i] * embedding[i])::DOUBLE)), (a, b) -> a + b)"
        val qn =
          "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> (q_emb[i] * q_emb[i])::DOUBLE)), (a, b) -> a + b)"
        val en =
          "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> (embedding[i] * embedding[i])::DOUBLE)), (a, b) -> a + b)"
        s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
           |scored AS (
           |  SELECT q_id, vec_id,
           |    $dot / (sqrt($qn) * sqrt($en)) AS cosine, $dot AS dot
           |  FROM q JOIN embeddings ON vec_id != q_id),
           |ra AS (SELECT q_id, vec_id, rank_a FROM (
           |  SELECT q_id, vec_id,
           |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank_a
           |  FROM scored WHERE NOT coalesce(isnan(cosine), TRUE)) WHERE rank_a <= 20),
           |rb AS (SELECT q_id, vec_id, rank_b FROM (
           |  SELECT q_id, vec_id,
           |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot DESC, vec_id) AS rank_b
           |  FROM scored WHERE NOT coalesce(isnan(dot), TRUE)) WHERE rank_b <= 20),
           |fused AS (
           |  SELECT COALESCE(ra.q_id, rb.q_id) AS q_id,
           |    COALESCE(ra.vec_id, rb.vec_id) AS vec_id,
           |    COALESCE(1.0::DOUBLE / (60.0::DOUBLE + CAST(rank_a AS DOUBLE)), 0.0::DOUBLE)
           |      + COALESCE(1.0::DOUBLE / (60.0::DOUBLE + CAST(rank_b AS DOUBLE)), 0.0::DOUBLE) AS rrf
           |  FROM ra FULL JOIN rb ON ra.q_id = rb.q_id AND ra.vec_id = rb.vec_id)
           |SELECT q_id, vec_id, rank, rrf FROM (
           |  SELECT q_id, vec_id,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rrf DESC, vec_id) AS INT) AS rank,
           |    rrf
           |  FROM fused) WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
      }),

    // ---- NDCG@10 ranking-quality eval ---------------------------------------
    // ann_recall_report grades set overlap; rank_fusion merges rankings;
    // THIS grades ORDER quality — the standard retrieval metric
    // (Järvelin & Kekäläinen 2002): graded relevance discounted by
    // 1/log2(rank+1), normalized by the ideal ordering. log2 is
    // transcendental, so the 20 discount values are published constants
    // in ppm (the Benford/hllAlpha discipline — one ndcgDiscCase
    // definition embedded in BOTH engines). Fixture: three term queries
    // ranked by exact term frequency (TopK(10) bounded fold — every map
    // task reduces to <= 10 entries before the shuffle, never a corpus
    // rank window), graded by the CO-TOPIC term's capped tf (spark↔join,
    // join↔window, window↔spark) so ranking order and relevance order
    // genuinely diverge and NDCG lands strictly inside (0, 1). Scale
    // shape: one tokenize pass feeds all three tf columns and all three
    // bounded folds; the 30-row ranked set broadcasts back for grades;
    // every NDCG stage after runs on the result-list domain. -----------------
    "ndcg_eval" -> QueryDef(
      (s, dir) => {
        val topk = udaf(new graft.functions.TopK(10),
          Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
        val slim = Tables.load(s, dir, "documents")
          .selectExpr("doc_id", s"${Portable.tokensSql("text")} AS toks")
          .selectExpr("doc_id",
            "size(filter(toks, t -> t = 'spark')) AS tfs",
            "size(filter(toks, t -> t = 'join')) AS tfj",
            "size(filter(toks, t -> t = 'window')) AS tfw")
          .persist(StorageLevel.MEMORY_AND_DISK)
        // NaN scores are dropped by the TopK buffer: tf = 0 docs never rank
        def sc(tf: String) =
          expr(s"IF($tf > 0, CAST($tf AS DOUBLE), CAST('NaN' AS DOUBLE))")
        // persisted: the 1-row TopK frame feeds three union branches AND
        // the grade join — without this the corpus fold re-executes per
        // consumer (the mad_outliers median-frame rule)
        val tops = slim.agg(
          topk(sc("tfs"), col("doc_id")).as("ts"),
          topk(sc("tfj"), col("doc_id")).as("tj"),
          topk(sc("tfw"), col("doc_id")).as("tw"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val ranked = Seq(("spark", "ts"), ("join", "tj"), ("window", "tw"))
          .map { case (q, c) => tops
            .select(lit(q).as("qid"), posexplode(col(c)).as(Seq("pos", "t")))
            .selectExpr("qid", "pos + 1 AS rank", "t._2 AS doc_id") }
          .reduce(_ union _)
        val graded = slim.join(broadcast(ranked), "doc_id")
          .selectExpr("qid", "rank",
            """CAST(CASE qid WHEN 'spark' THEN least(3, tfj)
              |     WHEN 'join' THEN least(3, tfw)
              |     ELSE least(3, tfs) END AS BIGINT) AS rel""".stripMargin)
        ndcgAt(graded, 10)
      }, {
        def tf(t: String) = s"len(list_filter(toks, x -> x = '$t'))"
        s"""WITH tf AS (SELECT doc_id, ${tf("spark")} AS tfs,
           |    ${tf("join")} AS tfj, ${tf("window")} AS tfw
           |  FROM (SELECT doc_id, ${Portable.duckToksSql("text")} AS toks
           |        FROM documents)),
           |q AS (SELECT * FROM (VALUES ('spark'), ('join'), ('window')) v(qid)),
           |sc AS (SELECT qid, doc_id,
           |    CASE qid WHEN 'spark' THEN tfs WHEN 'join' THEN tfj ELSE tfw END AS tf,
           |    CASE qid WHEN 'spark' THEN LEAST(3, tfj)
           |         WHEN 'join' THEN LEAST(3, tfw)
           |         ELSE LEAST(3, tfs) END AS rel
           |  FROM q CROSS JOIN tf),
           |rk AS (SELECT qid, rel, ROW_NUMBER() OVER (PARTITION BY qid
           |    ORDER BY tf DESC, doc_id) AS rank
           |  FROM sc WHERE tf > 0),
           |top AS (SELECT * FROM rk WHERE rank <= 10),
           |dc AS (SELECT qid, SUM(rel * ${ndcgDiscCase("rank")})::BIGINT AS dcg
           |  FROM top GROUP BY 1),
           |ir AS (SELECT qid, rel, ROW_NUMBER() OVER (PARTITION BY qid
           |    ORDER BY rel DESC, rank) AS irank FROM top),
           |ic AS (SELECT qid, SUM(rel * ${ndcgDiscCase("irank")})::BIGINT AS idcg
           |  FROM ir GROUP BY 1)
           |SELECT dc.qid, dcg AS dcg_scaled, idcg AS idcg_scaled,
           |  CASE WHEN idcg = 0 THEN 0
           |       ELSE CAST(dcg::HUGEINT * 1000000 // idcg AS BIGINT) END AS ndcg_ppm
           |FROM dc JOIN ic USING (qid) ORDER BY qid""".stripMargin
      }),

    // ---- MAP / MRR ranking eval ---------------------------------------------
    // ndcg_eval grades GRADED relevance; average precision and
    // reciprocal rank are the binary-judgment standards (TREC's MAP,
    // the MRR of QA evals). AP = mean over relevant retrieved positions
    // of precision@that-position; every term is a truncated integer
    // division SHARED by both engines (the repo's trunc-form
    // convention), summed then divided by the retrieved-relevant count
    // (the judged-pool convention, documented); RR = 10⁶ div the first
    // relevant rank. Same bounded-TopK ranked fixture as ndcg_eval,
    // binarized at co-topic tf > 0; every stage after the ranking runs
    // on the result-list domain. -----------------------------------------
    "map_eval" -> QueryDef(
      (s, dir) => {
        val topk = udaf(new graft.functions.TopK(10),
          Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
        val slim = Tables.load(s, dir, "documents")
          .selectExpr("doc_id", s"${Portable.tokensSql("text")} AS toks")
          .selectExpr("doc_id",
            "size(filter(toks, t -> t = 'spark')) AS tfs",
            "size(filter(toks, t -> t = 'join')) AS tfj",
            "size(filter(toks, t -> t = 'window')) AS tfw")
          .persist(StorageLevel.MEMORY_AND_DISK)
        def sc(tf: String) =
          expr(s"IF($tf > 0, CAST($tf AS DOUBLE), CAST('NaN' AS DOUBLE))")
        // persisted: the 1-row TopK frame feeds three union branches AND
        // the grade join — without this the corpus fold re-executes per
        // consumer (the mad_outliers median-frame rule)
        val tops = slim.agg(
          topk(sc("tfs"), col("doc_id")).as("ts"),
          topk(sc("tfj"), col("doc_id")).as("tj"),
          topk(sc("tfw"), col("doc_id")).as("tw"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val ranked = Seq(("spark", "ts"), ("join", "tj"), ("window", "tw"))
          .map { case (q, c) => tops
            .select(lit(q).as("qid"), posexplode(col(c)).as(Seq("pos", "t")))
            .selectExpr("qid", "pos + 1 AS rank", "t._2 AS doc_id") }
          .reduce(_ union _)
        val graded = slim.join(broadcast(ranked), "doc_id")
          .selectExpr("qid", "rank",
            """CAST(CASE qid WHEN 'spark' THEN CAST(tfj > 0 AS INT)
              |     WHEN 'join' THEN CAST(tfw > 0 AS INT)
              |     ELSE CAST(tfs > 0 AS INT) END AS BIGINT) AS rel""".stripMargin)
        avgPrecisionAt(graded, 10)
      }, {
        def tf(t: String) = s"len(list_filter(toks, x -> x = '$t'))"
        s"""WITH tf AS (SELECT doc_id, ${tf("spark")} AS tfs,
           |    ${tf("join")} AS tfj, ${tf("window")} AS tfw
           |  FROM (SELECT doc_id, ${Portable.duckToksSql("text")} AS toks
           |        FROM documents)),
           |q AS (SELECT * FROM (VALUES ('spark'), ('join'), ('window')) v(qid)),
           |sc AS (SELECT qid, doc_id,
           |    CASE qid WHEN 'spark' THEN tfs WHEN 'join' THEN tfj ELSE tfw END AS tf,
           |    CASE qid WHEN 'spark' THEN CAST(tfj > 0 AS BIGINT)
           |         WHEN 'join' THEN CAST(tfw > 0 AS BIGINT)
           |         ELSE CAST(tfs > 0 AS BIGINT) END AS rel
           |  FROM q CROSS JOIN tf),
           |rk AS (SELECT qid, rel, ROW_NUMBER() OVER (PARTITION BY qid
           |    ORDER BY tf DESC, doc_id) AS rank
           |  FROM sc WHERE tf > 0),
           |top AS (SELECT * FROM rk WHERE rank <= 10),
           |ch AS (SELECT qid, rank, rel,
           |    SUM(rel) OVER (PARTITION BY qid ORDER BY rank
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cumhits
           |  FROM top)
           |SELECT qid, COUNT(*)::BIGINT AS n_ranked,
           |  SUM(rel)::BIGINT AS n_rel,
           |  CASE WHEN SUM(rel) = 0 THEN 0
           |       ELSE SUM(CASE WHEN rel > 0 THEN cumhits * 1000000 // rank
           |                ELSE 0 END) // SUM(rel) END::BIGINT AS ap_ppm,
           |  COALESCE(1000000 // MIN(CASE WHEN rel > 0 THEN rank END), 0)::BIGINT
           |    AS rr_ppm
           |FROM ch GROUP BY qid ORDER BY qid""".stripMargin
      })
  )

  /** 1/log2(rank+1) discount, ppm — log2 is transcendental, so these are
    * the published constants rounded offline (the Benford discipline),
    * recorded for ranks 1..20. */
  private[graft] lazy val ndcgDiscPpm: Seq[Long] = Seq(
    1000000L, 630930L, 500000L, 430677L, 386853L, 356207L, 333333L,
    315465L, 301030L, 289065L, 278943L, 270238L, 262650L, 255958L,
    250000L, 244651L, 239812L, 235409L, 231378L, 227670L)

  /** `CASE rank ... END` mapping a 1-based rank expression to its ppm
    * discount — ONE definition for both engines. */
  private[graft] def ndcgDiscCase(rank: String): String =
    ndcgDiscPpm.zipWithIndex
      .map { case (ppm, i) => s"WHEN $rank = ${i + 1} THEN $ppm" }
      .mkString("CASE ", " ", " ELSE 0 END")

  /** NDCG@k over a `(qid, rank, rel)` frame: rank is the system's 1-based
    * position, rel a non-negative int64 grade. DCG folds rel·disc(rank);
    * the ideal ordering re-ranks by (rel DESC, rank ASC — deterministic,
    * and gain-invariant under rel ties); ndcg_ppm = dcg·10⁶/idcg staged
    * in DECIMAL(38,0), idcg = 0 (no relevant docs retrieved) reads 0 by
    * guard. All stages run on the RESULT-LIST domain — the corpus never
    * enters this operator. `k` is capped at the recorded discount table. */
  def ndcgAt(ranked: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1 && k <= ndcgDiscPpm.size,
      s"k must be in [1, ${ndcgDiscPpm.size}] (recorded discounts), got $k")
    Seq("qid", "rank", "rel").foreach(c => require(ranked.columns.contains(c),
      s"ranked frame needs column $c, has ${ranked.columns.mkString(",")}"))
    val g = ranked.where(col("rank") >= 1 && col("rank") <= k)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dcg = g.selectExpr("qid", s"rel * ${ndcgDiscCase("rank")} AS gain")
      .groupBy(col("qid")).agg(sum(col("gain")).as("dcg_scaled"))
    val idcg = g
      .withColumn("irank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("rel").desc, col("rank"))))
      .where(col("irank") <= k)
      .selectExpr("qid", s"rel * ${ndcgDiscCase("irank")} AS gain")
      .groupBy(col("qid")).agg(sum(col("gain")).as("idcg_scaled"))
    dcg.join(idcg, "qid")
      .selectExpr("qid", "dcg_scaled", "idcg_scaled",
        """CASE WHEN idcg_scaled = 0 THEN 0L
          |     ELSE CAST(dcg_scaled AS DECIMAL(38,0)) * 1000000
          |          div idcg_scaled END AS ndcg_ppm""".stripMargin)
      .transform(graft.Sorted.byNames(_, "qid"))
  }

  /** Average precision + reciprocal rank over a `(qid, rank, rel)` frame
    * with rel > 0 meaning relevant: ap_ppm = Σ_{relevant i}
    * (cumhits_i·10⁶ div i) div R with R = retrieved-relevant (the
    * judged-pool convention — only what the ranking surfaced is judged;
    * every division is the trunc form both engines share), rr_ppm =
    * 10⁶ div first-relevant rank. R = 0 reads 0 for both. All stages
    * run on the RESULT-LIST domain. */
  def avgPrecisionAt(ranked: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    Seq("qid", "rank", "rel").foreach(c => require(ranked.columns.contains(c),
      s"ranked frame needs column $c, has ${ranked.columns.mkString(",")}"))
    ranked.where(col("rank") >= 1 && col("rank") <= k)
      .withColumn("cumhits", sum(expr("CAST(rel > 0 AS BIGINT)")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("rank"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_ranked"),
        sum(expr("CAST(rel > 0 AS BIGINT)")).as("n_rel"),
        sum(expr("IF(rel > 0, cumhits * 1000000 div rank, 0L)")).as("ap_num"),
        min(expr("IF(rel > 0, rank, NULL)")).as("first_hit"))
      .selectExpr("qid", "n_ranked", "n_rel",
        "CASE WHEN n_rel = 0 THEN 0L ELSE ap_num div n_rel END AS ap_ppm",
        "coalesce(1000000L div first_hit, 0L) AS rr_ppm")
      .transform(graft.Sorted.byNames(_, "qid"))
  }
}
