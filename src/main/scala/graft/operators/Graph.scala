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

  /** Directed page-transition edges (src, dst, w=count) from the event
    * stream — one window pass + one aggregation, shared by every graph
    * query (reference page chain: RT/app/dwd/BaseLogTask.java:126-135). */
  private def pageEdges(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(get_json_object(col("props"), "$.k").cast(LongType).as("src"),
        col("user_id"), col("ts"), col("event_id"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** One synchronous label-propagation step: each node adopts the label
    * with the largest total incident edge weight among its neighbors'
    * current labels, ties to the smallest label. `labels` is
    * node-domain-sized and explicitly [[broadcast]] (same pinning argument
    * as [[iterate]]); the argmax is `max(struct(w, -label))` — one
    * partial+final aggregate, no window. Exposed for PlanAuditSpec. */
  private[graft] def lpaStep(adj: org.apache.spark.sql.DataFrame,
                             labels: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    adj.join(broadcast(labels.select(col("page").as("v"), col("lbl"))), "v")
      .groupBy(col("u"), col("lbl")).agg(sum(col("w")).as("vw"))
      .groupBy(col("u"))
      .agg(max(struct(col("vw"), (-col("lbl")).as("nl"))).as("top"))
      .select(col("u").as("page"), (-col("top.nl")).as("lbl"))

  /** Shared DuckDB CTE chain ending in `edges(src, dst, w)`. The extract
    * must not couple to ONE exact JSON serialization: Spark parses props
    * with get_json_object (any valid JSON), so the oracle regex allows
    * optional whitespace after the colon, and NULLIF keeps a props row
    * WITHOUT `k` a NULL src (matching Spark) instead of a hard
    * CAST('' AS BIGINT) error. */
  private val duckEdges: String =
    """ev AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(NULLIF(regexp_extract(props, '"k":\s*([0-9]+)', 1), '') AS BIGINT) AS k
      |  FROM events),
      |hops AS (
      |  SELECT k AS src,
      |    LEAD(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      |  FROM ev),
      |edges AS (
      |  SELECT src, dst, COUNT(*) AS w FROM hops WHERE dst IS NOT NULL
      |  GROUP BY src, dst)""".stripMargin

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
        val edges = pageEdges(s, dir)
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
      s"""WITH $duckEdges,
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
        |ORDER BY rank_scaled DESC, page""".stripMargin),

    // ---- per-page degree/strength profile ---------------------------------
    // The first report run on any new graph (and the input to the
    // degree-ordered orientation knob triangle_count documents): distinct
    // in/out neighbor counts and in/out edge weight per page. Scale shape:
    // the edge table is built once; out- and in-side folds are partial+
    // final over (src)/(dst) — node-domain-sized outputs — joined
    // full-outer so sources-only and sinks-only pages both appear. ---------
    "graph_degree_stats" -> QueryDef(
      (s, dir) => {
        val edges = pageEdges(s, dir).persist(StorageLevel.MEMORY_AND_DISK)
        val out = edges.groupBy(col("src").as("page"))
          .agg(count(lit(1)).as("out_deg"), sum(col("w")).as("out_w"))
        val in = edges.groupBy(col("dst").as("page"))
          .agg(count(lit(1)).as("in_deg"), sum(col("w")).as("in_w"))
        // lazy result — edge cache feeds both folds (harness clears it)
        out.join(in, Seq("page"), "full_outer")
          .selectExpr("page",
            "coalesce(out_deg, 0L) AS out_deg", "coalesce(out_w, 0L) AS out_w",
            "coalesce(in_deg, 0L) AS in_deg", "coalesce(in_w, 0L) AS in_w")
          .transform(graft.Sorted.byNames(_, "page"))
      },
      s"""WITH $duckEdges,
         |outs AS (SELECT src AS page, COUNT(*) AS out_deg, CAST(SUM(w) AS BIGINT) AS out_w
         |  FROM edges GROUP BY src),
         |ins AS (SELECT dst AS page, COUNT(*) AS in_deg, CAST(SUM(w) AS BIGINT) AS in_w
         |  FROM edges GROUP BY dst)
         |SELECT COALESCE(o.page, i.page) AS page,
         |  COALESCE(out_deg, 0) AS out_deg, COALESCE(out_w, 0) AS out_w,
         |  COALESCE(in_deg, 0) AS in_deg, COALESCE(in_w, 0) AS in_w
         |FROM outs o FULL OUTER JOIN ins i ON o.page = i.page
         |ORDER BY page""".stripMargin),

    // ---- BFS reachability levels (3 hops from the minimum page id) --------
    // Scale shape: the frontier and visited sets are node-domain-bounded,
    // so both broadcast — per hop the DIRECTED edge table sees one
    // broadcast-join probe (map-side) and the only shuffle is the
    // node-bounded distinct; the not-yet-visited filter is a broadcast
    // left-anti join. localCheckpoint after each hop bounds plan depth
    // exactly like the PageRank/LPA loops. Level count is fixed (3), so
    // the oracle unrolls the same frontier algebra as plain CTEs. ----------
    "graph_bfs_levels" -> QueryDef(
      (s, dir) => {
        val edges = pageEdges(s, dir).select(col("src"), col("dst"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val src0 = edges.agg(least(min(col("src")), min(col("dst"))).as("page"))
        var visited = src0.withColumn("level", lit(0L)).localCheckpoint(true)
        var frontier = visited.select(col("page"))
        for (k <- 1 to 3) {
          val next = edges
            .join(broadcast(frontier), edges("src") === frontier("page"))
            .select(col("dst").as("page")).distinct()
            .join(broadcast(visited.select(col("page"))), Seq("page"), "left_anti")
            .withColumn("level", lit(k.toLong))
            .localCheckpoint(true)
          visited = visited.union(next).localCheckpoint(true)
          frontier = next.select(col("page"))
        }
        edges.unpersist()
        visited.transform(graft.Sorted.byNames(_, "page"))
      },
      s"""WITH $duckEdges,
         |v0 AS (SELECT least((SELECT MIN(src) FROM edges),
         |                    (SELECT MIN(dst) FROM edges)) AS page,
         |               CAST(0 AS BIGINT) AS level),
         |l1 AS (SELECT DISTINCT e.dst AS page, CAST(1 AS BIGINT) AS level
         |  FROM edges e JOIN v0 ON e.src = v0.page
         |  WHERE e.dst NOT IN (SELECT page FROM v0)),
         |v1 AS (SELECT * FROM v0 UNION ALL SELECT * FROM l1),
         |l2 AS (SELECT DISTINCT e.dst AS page, CAST(2 AS BIGINT) AS level
         |  FROM edges e JOIN l1 ON e.src = l1.page
         |  WHERE e.dst NOT IN (SELECT page FROM v1)),
         |v2 AS (SELECT * FROM v1 UNION ALL SELECT * FROM l2),
         |l3 AS (SELECT DISTINCT e.dst AS page, CAST(3 AS BIGINT) AS level
         |  FROM edges e JOIN l2 ON e.src = l2.page
         |  WHERE e.dst NOT IN (SELECT page FROM v2)),
         |v3 AS (SELECT * FROM v2 UNION ALL SELECT * FROM l3)
         |SELECT page, level FROM v3 ORDER BY page""".stripMargin),

    // ---- per-node triangle participation counts ---------------------------
    // Scale shape: canonical orientation (a < b, self-loops dropped) halves
    // the edge set and makes each triangle enumerable exactly once as
    // a < b < c: wedge = und ⋈ und on b (the one graph-sized shuffle),
    // closed by a semi-shaped join back to und on (a, c). Per-node counts
    // are a partial+final sum over the 3-way unnest of each triangle. On a
    // skewed power-law graph the production knob is degree-ordered
    // orientation (low-degree vertex first) — id-orientation is kept here
    // because the page-id domain is bounded and the oracle replays it
    // verbatim. No all-pairs product anywhere.
    "triangle_count" -> QueryDef(
      (s, dir) => {
        val und = pageEdges(s, dir)
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .filter(col("a") =!= col("b"))
          .distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        val tri = und.alias("e1")
          .join(und.alias("e2"), expr("e1.b = e2.a"))
          .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
          .join(und.alias("e3"), expr("x = e3.a AND z = e3.b"))
          .select(col("x"), col("y"), col("z"))
        // lazy result — the und cache must survive until execution (the
        // harness clears cache per query; eager-checkpoint loops are the
        // only place an in-builder unpersist is sound)
        tri.select(explode(array(col("x"), col("y"), col("z"))).as("page"))
          .groupBy(col("page")).agg(count(lit(1)).as("n_triangles"))
          .transform(graft.Sorted.byNames(_, "page"))
      },
      s"""WITH $duckEdges,
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM edges WHERE src <> dst),
         |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM und e1 JOIN und e2 ON e1.b = e2.a
         |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
         |nodes AS (SELECT unnest([x, y, z]) AS page FROM tri)
         |SELECT page, COUNT(*) AS n_triangles FROM nodes
         |GROUP BY page ORDER BY page""".stripMargin),

    // ---- link prediction: neighbor-set jaccard for unconnected pairs ------
    // score(u,v) = |N(u) ∩ N(v)| / |N(u) ∪ N(v)| over the undirected
    // graph, for pairs NOT already connected — the classic missing-edge
    // predictor. No neighbor SETS are ever materialized: the intersection
    // is a wedge COUNT (u—m—v through each shared middle, one graph-sized
    // equi-join), the union is du + dv − shared from the degree table, and
    // existing edges drop via a left-anti join. Wedge cost is Σ deg(m)² —
    // on power-law graphs cap or sample hub middles (the triangle_count
    // orientation argument); the bounded page domain here needs neither.
    // Top-20 via TakeOrdered, ties (sim, u, v) deterministic. --------------
    "graph_jaccard_neighbors" -> QueryDef(
      (s, dir) => {
        val und = pageEdges(s, dir)
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .filter(col("a") =!= col("b"))
          .distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        val nb = und.select(col("a").as("m"), col("b").as("n"))
          .union(und.select(col("b").as("m"), col("a").as("n")))
        val deg = nb.groupBy(col("n").as("page")).agg(count(lit(1)).as("d"))
        val shared = nb.alias("x").join(nb.alias("y"),
            expr("x.m = y.m AND x.n < y.n"))
          .select(col("x.n").as("u"), col("y.n").as("v"))
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("shared"))
        // lazy result — und cache feeds nb twice plus the anti-join side
        shared
          .join(und, expr("u = a AND v = b"), "left_anti")
          .join(deg.selectExpr("page AS u", "d AS du"), "u")
          .join(deg.selectExpr("page AS v", "d AS dv"), "v")
          .selectExpr("u", "v", "shared",
            "CAST(shared AS DOUBLE) / (du + dv - shared) AS jaccard")
          .orderBy(col("jaccard").desc, col("u"), col("v"))
          .limit(20)
      },
      s"""WITH $duckEdges,
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM edges WHERE src <> dst),
         |nb AS (SELECT a AS m, b AS n FROM und UNION ALL SELECT b, a FROM und),
         |deg AS (SELECT n AS page, COUNT(*) AS d FROM nb GROUP BY n),
         |shared AS (SELECT x.n AS u, y.n AS v, COUNT(*) AS shared
         |  FROM nb x JOIN nb y ON x.m = y.m AND x.n < y.n
         |  GROUP BY 1, 2),
         |unconnected AS (SELECT u, v, shared FROM shared
         |  WHERE NOT EXISTS (SELECT 1 FROM und WHERE a = u AND b = v))
         |SELECT u, v, shared,
         |  CAST(shared AS DOUBLE) / (du.d + dv.d - shared) AS jaccard
         |FROM unconnected
         |JOIN deg du ON du.page = u JOIN deg dv ON dv.page = v
         |ORDER BY jaccard DESC, u, v LIMIT 20""".stripMargin),

    // ---- weighted label propagation communities (2 sync iterations) -------
    // Scale shape: adjacency = canonical edges + their reverses with summed
    // weights, built once and persisted; each iteration is ONE join
    // (labels ⋈ adjacency on the neighbor side — labels are
    // node-domain-sized so they broadcast, same reasoning as
    // pagerank_pages' rank side) + one (node, label) weight sum + one
    // deterministic argmax via max(struct(w, -label)) — max weight, ties
    // to the SMALLEST label, bit-identical to the oracle's
    // row_number(ORDER BY w DESC, label). Integer weights throughout: no
    // float order-dependence. localCheckpoint bounds plan depth per round.
    "graph_communities" -> QueryDef(
      (s, dir) => {
        val e = pageEdges(s, dir).filter(col("src") =!= col("dst"))
        val adj = e.select(col("src").as("u"), col("dst").as("v"), col("w"))
          .union(e.select(col("dst").as("u"), col("src").as("v"), col("w")))
          .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val nodes = adj.select(col("u").as("page")).distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        var labels = nodes.withColumn("lbl", col("page")).localCheckpoint(true)
        for (_ <- 1 to 2)
          labels = lpaStep(adj, labels).localCheckpoint(true)
        val out = labels.select(col("page"), col("lbl").as("community"))
          .transform(graft.Sorted.byNames(_, "page"))
        adj.unpersist()
        nodes.unpersist()
        out
      },
      s"""WITH $duckEdges,
         |e AS (SELECT src, dst, w FROM edges WHERE src <> dst),
         |adj AS (SELECT u, v, CAST(SUM(w) AS BIGINT) AS w FROM (
         |    SELECT src AS u, dst AS v, w FROM e
         |    UNION ALL SELECT dst AS u, src AS v, w FROM e)
         |  GROUP BY u, v),
         |l0 AS (SELECT DISTINCT u AS page, u AS lbl FROM adj),
         |v1 AS (SELECT adj.u, l.lbl, CAST(SUM(adj.w) AS BIGINT) AS vw
         |  FROM adj JOIN l0 l ON l.page = adj.v GROUP BY adj.u, l.lbl),
         |l1 AS (SELECT u AS page, lbl FROM (
         |    SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u ORDER BY vw DESC, lbl) AS rn
         |    FROM v1) WHERE rn = 1),
         |v2 AS (SELECT adj.u, l.lbl, CAST(SUM(adj.w) AS BIGINT) AS vw
         |  FROM adj JOIN l1 l ON l.page = adj.v GROUP BY adj.u, l.lbl),
         |l2 AS (SELECT u AS page, lbl FROM (
         |    SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u ORDER BY vw DESC, lbl) AS rn
         |    FROM v2) WHERE rn = 1)
         |SELECT page, lbl AS community FROM l2 ORDER BY page""".stripMargin),

    // ---- k-core decomposition of the part co-purchase graph ---------------
    // Dense-community mining over the market-basket projection: parts
    // co-occurring in an order form an edge; the k-core (every surviving
    // node keeps >= k surviving neighbors) isolates the densely
    // cross-sold assortment. Substrate choice is deliberate: the
    // co-purchase node domain GROWS with the corpus while the degree
    // distribution stays put (measured sf0.001/0.01/0.1 medians 89/115/119)
    // — so a fixed k keeps meaning at any scale, unlike the bounded
    // page-id graph, which saturates toward complete. Scale shape: the
    // only corpus-sized frames are the per-order pair expansion (bounded
    // per-key quadratic: order size is ~7 lines at any SF) and the edge
    // set; each peel round is one partial+final degree sum plus two
    // broadcast anti-joins on the PEELED set (small by construction —
    // nodes near the threshold), and localCheckpoint truncates lineage so
    // plan depth is constant per round. Semantics contract: the result is
    // "after exactly `rounds` peels", which EQUALS the true k-core
    // whenever peeling converges within the budget (KcoreSpec pins both a
    // converged case and a cascade that needs every round). -------------
    "graph_kcore" -> QueryDef(
      // the edge cache stays persisted: kcore() is LAZY over `und` (the
      // round-16 restructure — the surviving subgraph is `und` minus the
      // accumulated peeled sets, so und is referenced by every round's
      // degree fold AND the final readout) — unpersisting before the
      // action would re-run the pair-expansion self-join per reference
      // (the graph_assortativity no-early-unpersist rule; the harness
      // clears caches per query)
      (s, dir) => kcore(copurchaseEdges(s, dir), k = 80, rounds = 3)
        .transform(graft.Sorted.byNames(_, "part")), {
        val rounds = 3
        val peels = (1 to rounds).map { i =>
          s"""d$i AS (SELECT v, COUNT(*) AS deg FROM (
             |    SELECT a AS v FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1}) GROUP BY v),
             |b$i AS (SELECT v FROM d$i WHERE deg < 80),
             |e$i AS (SELECT a, b FROM e${i - 1}
             |  WHERE NOT EXISTS (SELECT 1 FROM b$i WHERE b$i.v = a)
             |    AND NOT EXISTS (SELECT 1 FROM b$i WHERE b$i.v = b))""".stripMargin
        }.mkString(",\n")
        s"""WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
           |e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
           |  FROM lp x JOIN lp y ON x.o = y.o AND x.p < y.p),
           |$peels
           |SELECT v AS part, COUNT(*) AS deg FROM (
           |  SELECT a AS v FROM e$rounds UNION ALL SELECT b FROM e$rounds)
           |GROUP BY v ORDER BY part""".stripMargin
      }),

    // ---- degree assortativity of the co-purchase graph --------------------
    // Newman 2002's mixing coefficient: the degree-degree Pearson r over
    // edge endpoints — positive (hubs link hubs) vs negative (hub-spoke)
    // decides whether hub-sampling strategies and the kcore read
    // generalize. For an UNDIRECTED graph both orientations enter, so by
    // symmetry sum_x = sum_y and sum_x2 = sum_y2 and the Pearson
    // denominator's sqrt CANCELS: r = (M·Σxy − (Σx)²)/(M·Σx² − (Σx)²) is
    // fully rational — emitted as exact integer ppm with the ts_acf sign
    // decomposition (Spark div truncates, DuckDB // floors; decomposed,
    // every division is non-negative where they agree). DECIMAL(38,0)
    // staging headroom: M·Σxy ≈ 4e34 at 1e12 edges × 1e5 max degree.
    // Scale shape: bounded per-order pair expansion, one partial+final
    // degree fold, two node-keyed equi joins (node domain = the catalog,
    // grows — never broadcast by design), a single-row fold. ---------------
    "graph_assortativity" -> QueryDef(
      // the edge cache stays persisted: assortativity() is LAZY and
      // references und three times (degree union twice, the edge join
      // once) — unpersisting before the action would silently recompute
      // the pair-expansion self-join per reference (the Dedup.scala
      // no-early-unpersist rule; the harness clears caches per query)
      (s, dir) => assortativity(copurchaseEdges(s, dir)),
      """WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.o = y.o AND x.p < y.p),
        |d AS (SELECT v, COUNT(*) AS deg FROM (
        |    SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0) GROUP BY v),
        |j AS (SELECT da.deg AS x, db.deg AS y FROM e0
        |  JOIN d da ON da.v = e0.a JOIN d db ON db.v = e0.b),
        |s AS (SELECT COUNT(*)::HUGEINT * 2 AS m,
        |    SUM((x + y)::HUGEINT) AS sx,
        |    SUM((x::HUGEINT * x) + (y::HUGEINT * y)) AS sxx,
        |    SUM(2 * (x::HUGEINT * y)) AS sxy
        |  FROM j),
        |r AS (SELECT (SELECT COUNT(*) FROM d) AS n_nodes, m // 2 AS n_edges,
        |    m * sxy - sx * sx AS num, m * sxx - sx * sx AS den FROM s),
        |q AS (SELECT n_nodes, n_edges, num, den,
        |    CASE WHEN den <= 0 THEN 0 ELSE (ABS(num) * 1000) // den END AS q3
        |  FROM r)
        |SELECT n_nodes, CAST(n_edges AS BIGINT) AS n_edges,
        |  CASE WHEN den <= 0 THEN 0
        |    ELSE CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
        |      * (q3 * 1000 + ((ABS(num) * 1000 - q3 * den) * 1000) // den)
        |      AS BIGINT) END AS assortativity_ppm
        |FROM q""".stripMargin),

    // ---- sampled harmonic closeness over the co-purchase graph ------------
    // Which parts sit CENTRAL in the co-purchase structure (the "everything
    // is bought with this" staples vs peripheral specialty items)? Exact
    // closeness needs all-pairs shortest paths — O(N·E), never at 100 TB.
    // The standard estimator (Eppstein–Wang 2004 shape): BFS from a SEED
    // SAMPLE, harmonic sum H(v) = Σ_seeds 1/d(seed, v) over reached seeds
    // (harmonic, not classic closeness, so unreached seeds contribute 0
    // instead of poisoning the mean — Boldi–Vigna 2014); undirected
    // symmetry makes d(seed, v) = d(v, seed). Reported as the exact
    // integer milli-sum over the sample (caller scales by N/|S| for the
    // population estimate). Scale shape: MULTI-source BFS with BITMAP
    // frontiers — each seed gets a dense index and reached-seed sets ride
    // as 64-bit words keyed (node, word_idx), so state and frontier are
    // N·ceil(|S|/64) rows instead of the round-11 |S|·N (seed, node)
    // pairs: a ~|S|/⌈|S|/64⌉ (≈64×) cut in frontier rows, edge-join
    // fan-out and visited-mask volume. Frontier joins stay node-keyed
    // equi SHUFFLE joins (never a broadcast of an N-shaped frame), the
    // per-(node, word) bit_or fold is partial+final, the visited mask is
    // a (node, word_idx)-keyed left join with bits & ~prev, and
    // localCheckpoint truncates lineage per round (the pagerank
    // discipline). `rounds` bounds the radius: distances beyond it read
    // as unreached (sums bias low at the periphery — the documented
    // bounded-radius contract). --------------------------------------------
    "graph_closeness" -> QueryDef(
      (s, dir) => {
        val und = copurchaseEdges(s, dir)
        val out = harmonicCloseness(und)
        und.unpersist()
        out
      }, {
        val rounds = 3
        val levels = (1 to rounds).map { i =>
          s"""l$i AS (SELECT DISTINCT f.seed, ed.dst AS node, CAST($i AS BIGINT) AS level
             |  FROM ed JOIN l${i - 1} f ON ed.src = f.node
             |  WHERE NOT EXISTS (SELECT 1 FROM v${i - 1} p
             |    WHERE p.seed = f.seed AND p.node = ed.dst)),
             |v$i AS (SELECT * FROM v${i - 1} UNION ALL SELECT * FROM l$i)""".stripMargin
        }.mkString(",\n")
        s"""WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
           |e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
           |  FROM lp x JOIN lp y ON x.o = y.o AND x.p < y.p),
           |ed AS (SELECT a AS src, b AS dst FROM e0
           |  UNION ALL SELECT b AS src, a AS dst FROM e0),
           |nd AS (SELECT DISTINCT src AS v FROM ed),
           |l0 AS (SELECT v AS seed, v AS node, CAST(0 AS BIGINT) AS level
           |  FROM nd WHERE v % 199 = 0),
           |v0 AS (SELECT * FROM l0),
           |$levels
           |SELECT node, COUNT(*)::BIGINT AS n_seeds_reached,
           |  SUM(1000 // level)::BIGINT AS harmonic_milli
           |FROM v$rounds WHERE level >= 1
           |GROUP BY node ORDER BY node""".stripMargin
      })
  )

  /** THE part co-purchase projection, persisted: distinct undirected
    * `(a < b)` part pairs co-occurring in an order. ONE definition for
    * both registry consumers (`graph_kcore`, `graph_assortativity`) —
    * they claim to analyze the SAME graph, so the construction must be
    * impossible to desynchronize. Callers own the unpersist decision
    * (kcore may drop it after its eager checkpoint; lazy consumers must
    * leave it to the harness). */
  private[graft] def copurchaseEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val lp = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    lp.alias("x")
      .join(lp.alias("y"), expr("x.o = y.o AND x.p < y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Newman degree assortativity of an undirected `(a, b)` simple edge
    * frame, as exact integer ppm — see the `graph_assortativity` registry
    * comment for the symmetry, sign and staging contracts. */
  def assortativity(und: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    und
      .join(deg.selectExpr("v AS a", "deg AS x"), "a")
      .join(deg.selectExpr("v AS b", "deg AS y"), "b")
      .agg(
        (count(lit(1)) * 2).cast("decimal(38,0)").as("m"),
        sum(expr("CAST(x + y AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x + CAST(y AS DECIMAL(38,0)) * y")).as("sxx"),
        sum(expr("2 * (CAST(x AS DECIMAL(38,0)) * y)")).as("sxy"))
      .crossJoin(broadcast(nNodes))
      .selectExpr("n_nodes", "CAST(m div 2 AS BIGINT) AS n_edges",
        "m * sxy - sx * sx AS num", "m * sxx - sx * sx AS den")
      // exact two-step long division: |num| * 1e6 can exceed 38 digits at
      // the trillion-edge extreme, but |num| <= den (|r| <= 1) keeps each
      // staged quotient <= 1000 and each product inside DECIMAL(38,0):
      // floor(a*1e6/d) = floor(a*1e3/d)*1e3 + floor((a*1e3 mod d)*1e3/d)
      .selectExpr("n_nodes", "n_edges", "num", "den",
        "CASE WHEN den <= 0 THEN 0L" +
          " ELSE CAST(ABS(num) * 1000 div den AS BIGINT) END AS q3")
      .selectExpr("n_nodes", "n_edges",
        "CASE WHEN den <= 0 THEN 0L" +
          " ELSE IF(num < 0, -1L, 1L) * (q3 * 1000L" +
          " + CAST((ABS(num) * 1000 - CAST(q3 AS DECIMAL(38,0)) * den) * 1000" +
          " div den AS BIGINT)) END AS assortativity_ppm")
  }

  /** `rounds` synchronous peels of the (`a` < `b`) undirected simple edge
    * frame: each round drops every node whose surviving degree is below
    * `k` together with its incident edges. Returns surviving (part, deg)
    * where deg is the degree INSIDE the surviving subgraph — equal to the
    * true k-core at convergence (see the `graph_kcore` registry comment).
    * The peeled set is explicitly [[broadcast]]: it is bounded by the
    * near-threshold population, not the corpus; on a graph where a round
    * peels a large fraction the knob is a plain shuffle anti-join.
    *
    * Round-16 shape (guide §2.4 — remove shuffles outright): the
    * surviving subgraph is represented LAZILY as `und` minus the
    * accumulated per-round peeled sets (each a tiny eager checkpoint, so
    * every round's threshold decision is pinned exactly once), instead of
    * eagerly re-checkpointing the whole surviving edge frame per round.
    * The old shape re-wrote a corpus-sized frame `rounds` times when a
    * round typically peels only the near-threshold fringe (measured
    * sf0.1: 3 × ~190 MB checkpoint writes + re-reads for a peel that
    * removes <2% of edges — 8.8 s → 5.0 s after). Plan depth grows by two
    * broadcast anti-joins per round, so deep peels re-materialize every 4
    * rounds to keep the lineage bounded (the registry's rounds=3 never
    * does). `und` must stay persisted by the caller until the action —
    * every round's degree fold and the final readout re-read it. */
  private[graft] def kcore(und: org.apache.spark.sql.DataFrame, k: Int, rounds: Int): org.apache.spark.sql.DataFrame = {
    var e = und
    for (r <- 1 to rounds) {
      e = kcorePeel(e, k)
      if (r % 4 == 0 && r < rounds) e = e.localCheckpoint(true)
    }
    kcoreDegrees(e).select(col("v").as("part"), col("deg"))
  }

  /** Surviving-subgraph degrees: one partial+final sum over the two edge
    * endpoints — never a window. */
  private[graft] def kcoreDegrees(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))

  /** One peel round, exposed (pre-checkpoint) so PlanAuditSpec can pin the
    * broadcast anti-join shape the loop consumes. */
  private[graft] def kcorePeel(e: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    // the peeled set is materialized ONCE per round (eager checkpoint):
    // both anti-join build sides read the same small frame instead of
    // re-running the degree aggregation per join
    val bad = kcoreDegrees(e).filter(col("deg") < k).select(col("v"))
      .localCheckpoint(true)
    e.join(broadcast(bad), col("a") === col("v"), "left_anti")
      .join(broadcast(bad), col("b") === col("v"), "left_anti")
  }

  /** Sampled harmonic closeness of an undirected `(a, b)` simple edge
    * frame — see the `graph_closeness` registry comment for the
    * estimator, sampling and bounded-radius contracts. `seedEvery`
    * selects the deterministic seed sample (nodes ≡ 0 mod seedEvery);
    * `rounds` is the BFS radius. Output: (node, n_seeds_reached,
    * harmonic_milli = Σ 1000 div d over reached seeds).
    *
    * Round-12 shape: reached-seed sets are PACKED 64-per-word — each
    * seed gets a dense index (a distributed sorted zipWithIndex over the
    * |S|-row sample — no single-partition stage even when a caller
    * leaves seedEvery small on a huge graph) and every state frame keys
    * (node, word_idx) with a 64-bit `bits` word. Per-round contribution
    * counts (bit_count of the newly-set words) accumulate lazily and
    * fold once at the end, so the harmonic sum never needs per-(seed,
    * node) rows at all. */
  def harmonicCloseness(und: org.apache.spark.sql.DataFrame,
      seedEvery: Long = 199L, rounds: Int = 3): org.apache.spark.sql.DataFrame = {
    require(seedEvery >= 1, s"seedEvery must be >= 1, got $seedEvery")
    require(rounds >= 1 && rounds <= 6,
      s"rounds must be in 1..6 (each round is a full frontier expansion), got $rounds")
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v"))).distinct()
    // dense seed index WITHOUT a single-partition window: orderBy range-
    // partitions the sorted seed sample and zipWithIndex assigns global
    // offsets with one lightweight per-partition count job — so the
    // indexer stays distributed even if a caller leaves seedEvery small
    // on a huge graph (|S| = N/seedEvery grows with the corpus at a
    // fixed knob; nothing here funnels it through one partition).
    // Eager checkpoint BEFORE the sort: orderBy's range partitioner runs
    // a sampling job, and zipWithIndex adds a count job — each would
    // re-execute the distinct-nodes shuffle behind the sample without a
    // materialization boundary; checkpointing the |S|-row filtered frame
    // first makes the sample/count/index jobs all read the tiny cached
    // blocks (sf0.1 solo readings for window vs zipWithIndex variants
    // were within ambient noise either way — the win is the SCALE shape,
    // not the fixture number)
    val seeds = nodes.filter(col("v") % seedEvery === 0)
      .localCheckpoint(true).orderBy(col("v"))
    val seedSchema = org.apache.spark.sql.types.StructType(
      seeds.schema.fields :+ org.apache.spark.sql.types.StructField(
        "idx", org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = seeds.sparkSession.createDataFrame(
      seeds.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) },
      seedSchema)
    val visited = indexed
      .select(col("v").as("node"), expr("idx div 64").as("widx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(idx % 64 AS INT))").as("bits"))
      .localCheckpoint(true)
    var frontier = visited
    // the visited mask stays LAZY: per round it is rebuilt as ONE bit_or
    // fold over the flat union of the ≤ rounds+1 checkpointed frontier
    // frames (round 16 — each round used to eagerly re-materialize the
    // merged N·W mask, a full extra shuffle write + job per round whose
    // only consumer is the NEXT round's left join; the per-round frames
    // are disjoint in (node, widx, bit) by construction, so the single
    // fold over their union is the same mask, recomputed from tiny
    // checkpoint blocks inside the join job instead of pinned by its own
    // job). Plan depth stays bounded: every union leg is a checkpoint
    // leaf and the fold is one aggregation, never nested.
    var visitedParts = Vector(visited)
    def visitedMask: org.apache.spark.sql.DataFrame =
      visitedParts.reduce(_ unionAll _)
        .groupBy(col("node"), col("widx")).agg(expr("bit_or(bits)").as("bits"))
    val contribs = Seq.newBuilder[org.apache.spark.sql.DataFrame]
    for (k <- 1 to rounds) {
      val next = bfsRound(edges, frontier, visitedMask).localCheckpoint(true)
      contribs += next.groupBy(col("node"))
        .agg(sum(expr("bit_count(bits)")).cast("long").as("cnt"))
        .withColumn("level", lit(k.toLong))
      visitedParts :+= next
      frontier = next
    }
    edges.unpersist()
    contribs.result().reduce(_ unionAll _)
      .groupBy(col("node"))
      .agg(sum(col("cnt")).as("n_seeds_reached"),
        sum(col("cnt") * expr("1000L div level")).as("harmonic_milli"))
      .transform(graft.Sorted.byNames(_, "node"))
  }

  /** One multi-source frontier expansion over packed seed bitmaps,
    * exposed (pre-checkpoint) so PlanAuditSpec can pin the shape the
    * loop consumes: the N·W frontier joins the edge stream BY NODE KEY
    * (shuffle equi — never a broadcast of an N-shaped frame, never a
    * product), the per-(node, word) bit_or fold is a partial+final hash
    * aggregate, and the visited mask is a (node, widx)-keyed left join
    * clearing already-reached bits (`bits & ~prev`), with only
    * still-novel words surviving. */
  private[graft] def bfsRound(edges: org.apache.spark.sql.DataFrame,
      frontier: org.apache.spark.sql.DataFrame,
      visited: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    edges
      .join(frontier, edges("src") === frontier("node"))
      .groupBy(col("dst").as("node"), col("widx"))
      .agg(expr("bit_or(bits)").as("bits"))
      .join(visited.withColumnRenamed("bits", "prev"), Seq("node", "widx"), "left")
      .select(col("node"), col("widx"),
        col("bits").bitwiseAND(bitwise_not(coalesce(col("prev"), lit(0L)))).as("bits"))
      .filter(col("bits") =!= 0L)
}
