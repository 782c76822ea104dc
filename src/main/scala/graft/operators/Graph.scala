package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

import scala.collection.immutable.ListMap

/** Iterative graph analytics over the event stream's page-transition graph
  * (nodes = `props.k` page ids, edges = consecutive events per user).
  * Complements [[Curation]]'s connected components (min-label propagation)
  * with a weighted PageRank — the "which pages matter" DWS-layer report a
  * visitor-analytics warehouse derives from the reference's page log
  * (page_id / last_page_id chains, RT/app/dwd/BaseLogTask.java:126-135).
  *
  * Cross-engine parity: PageRank in doubles is order-dependent (the
  * per-node contribution sum), so ranks are SCALED INT64 (1.0 ≡ 1_000_000)
  * and every step is integer arithmetic — damping 0.85 as `*85 div 100`,
  * per-edge contribution `(rank * 85 * w) div (100 * out_w)` — floor
  * division in both engines (operands are non-negative), exact and
  * order-independent, so three iterations stay bit-identical to the
  * oracle's three unrolled CTEs. Overflow headroom: total scaled mass is
  * ~1e8; `rank * 85 * w` peaks around 1e11 « 2^63.
  */
object Graph {

  /** One PageRank step: contributions flow src→dst over `esrc` (corpus-sized
    * edge frame, reused every round), new mass is summed per dst, and
    * dangling nodes fall back to the teleport term. `ranks` is
    * node-domain-sized (bounded page-id domain) so it is explicitly
    * [[broadcast]]: the per-iteration plan must not depend on AQE having
    * fresh stats for a just-checkpointed frame — on a cluster the edge side
    * is the only graph-sized shuffle each round. Exposed so PlanAuditSpec
    * can assert the broadcast on the pre-checkpoint plan. */
  private[graft] def iterate(esrc: org.apache.spark.sql.DataFrame,
                             nodes: org.apache.spark.sql.DataFrame,
                             ranks: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val contrib = esrc
      .join(broadcast(ranks), esrc("src") === ranks("page"))
      .select(col("dst").as("page"),
        expr("(r * 85L * w) div (100L * ow)").as("c"))
      .groupBy(col("page")).agg(sum(col("c")).as("in_mass"))
    nodes.join(contrib, Seq("page"), "left")
      .select(col("page"),
        (lit(150000L) + coalesce(col("in_mass"), lit(0L))).as("r"))
  }

  val defs: ListMap[String, QueryDef] = ListMap(

    // ---- weighted PageRank, 3 iterations, damping 0.85 --------------------
    // Scale shape: edges are built once (one window pass over events, one
    // (src,dst) aggregation) and persisted WITH their source out-weight, so
    // each iteration is exactly one join (ranks ⋈ edges on src — the
    // graph-sized shuffle real PageRank pays) plus one partial+final sum by
    // dst. Ranks are localCheckpoint'd per round: constant plan depth over
    // any iteration count (same recipe as Curation.connectedComponents;
    // single-process caveat documented there — use reliable checkpoint()
    // on a cluster). Dangling-node mass decays (no redistribution), which
    // is deterministic and mirrored by the oracle.
    "pagerank_pages" -> QueryDef(
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val hops = ev
          .select(get_json_object(col("props"), "$.k").cast(LongType).as("src"),
            col("user_id"), col("ts"), col("event_id"))
          .withColumn("dst", lead(col("src"), 1).over(w))
          .filter(col("dst").isNotNull)
        val edges = hops.groupBy(col("src"), col("dst"))
          .agg(count(lit(1)).as("w"))
        val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("ow"))
        // slim, reused every iteration: (src, dst, w, ow)
        val esrc = edges.join(outw, "src").persist(StorageLevel.MEMORY_AND_DISK)
        val nodes = esrc.select(col("src").as("page"))
          .union(esrc.select(col("dst")))
          .distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        var ranks = nodes.withColumn("r", lit(1000000L)).localCheckpoint(true)
        for (_ <- 1 to 3)
          ranks = iterate(esrc, nodes, ranks).localCheckpoint(true)
        esrc.unpersist()
        nodes.unpersist()
        ranks.select(col("page"), col("r").as("rank_scaled"))
          .orderBy(col("rank_scaled").desc, col("page"))
      },
      """WITH ev AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        |  FROM events),
        |hops AS (
        |  SELECT k AS src,
        |    LEAD(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
        |  FROM ev),
        |edges AS (
        |  SELECT src, dst, COUNT(*) AS w FROM hops WHERE dst IS NOT NULL
        |  GROUP BY src, dst),
        |outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src),
        |nodes AS (SELECT DISTINCT src AS page FROM edges
        |          UNION SELECT DISTINCT dst FROM edges),
        |r0 AS (SELECT page, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |r1 AS (
        |  SELECT n.page, 150000 + COALESCE(CAST(SUM((r.r * 85 * e.w) // (100 * o.ow)) AS BIGINT), 0) AS r
        |  FROM nodes n LEFT JOIN edges e ON e.dst = n.page
        |  LEFT JOIN r0 r ON r.page = e.src LEFT JOIN outw o ON o.src = e.src
        |  GROUP BY n.page),
        |r2 AS (
        |  SELECT n.page, 150000 + COALESCE(CAST(SUM((r.r * 85 * e.w) // (100 * o.ow)) AS BIGINT), 0) AS r
        |  FROM nodes n LEFT JOIN edges e ON e.dst = n.page
        |  LEFT JOIN r1 r ON r.page = e.src LEFT JOIN outw o ON o.src = e.src
        |  GROUP BY n.page),
        |r3 AS (
        |  SELECT n.page, 150000 + COALESCE(CAST(SUM((r.r * 85 * e.w) // (100 * o.ow)) AS BIGINT), 0) AS r
        |  FROM nodes n LEFT JOIN edges e ON e.dst = n.page
        |  LEFT JOIN r2 r ON r.page = e.src LEFT JOIN outw o ON o.src = e.src
        |  GROUP BY n.page)
        |SELECT page, CAST(r AS BIGINT) AS rank_scaled FROM r3
        |ORDER BY rank_scaled DESC, page""".stripMargin)
  )
}
