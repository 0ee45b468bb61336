package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relationally-derived graphs — the
  * PageRank companion to the connected-components machinery in
  * [[Dedup.connectedComponents]].
  *
  * Determinism stance: PageRank is usually float arithmetic, and float
  * sums are order-dependent — a cross-engine and cross-partitioning
  * hazard. Ranks here are FIXED-POINT integers (scale 1e12): every
  * operation is integer multiply / integer floor-division / integer sum,
  * all order-independent, so any engine that runs the same three
  * iterations produces bit-identical ranks. Truncation loss per division
  * is < 1 rank unit — ~1e-12 of the mass — irrelevant to ranking and
  * fully deterministic.
  */
object GraphOps {

  private val SCALE = 1000000000000L // 1e12 fixed-point

  /** PageRank (damping 0.85, 3 iterations) on the bipartite
    * part↔supplier graph induced by lineitem: nodes are parts (even ids,
    * `2·partkey`) and suppliers (odd ids, `2·suppkey+1`), edges are the
    * DISTINCT (part, supplier) pairs that ever shipped together, taken in
    * both directions. The symmetric union gives every node out-degree
    * ≥ 1 by construction — and [[pagerankOnEdges]] now VERIFIES that
    * precondition loudly (one anti-join count) instead of assuming it;
    * graphs with genuine sinks run with
    * `spark.graft.pagerank.dangling=true`, which redistributes dangling
    * mass uniformly each superstep (GraphOpsSpec exercises both paths —
    * the oracle covers this no-dangling graph). */
  def pagerank(s: SparkSession, d: String): DataFrame = {
    // widen: the 600k-row distinct's partial agg otherwise runs inside
    // the single-row-group scan's one task ([[graft.Tables.widen]])
    val e0 = graft.Tables.widen(lineitem(s, d)
        .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst")))
      .distinct()
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val dangling =
      graft.GraftConf.bool(s, "spark.graft.pagerank.dangling", default = false)
    pagerankOnEdges(edges, iters = 3, redistributeDangling = dangling)
      .select(
        when(col("node") % 2 === 0, "part").otherwise("supplier").as("node_type"),
        expr("node div 2").as("node_id"),
        col("rank").as("rank_fp"))
      .orderBy(col("node_type"), col("node_id"))
  }

  /** Fixed-point PageRank over ANY (src, dst) long edge list.
    *
    * Dangling nodes (in the node set via an in-edge, but no out-edges)
    * either fail fast — `redistributeDangling=false` throws with the
    * dangling count, never silently leaking their mass — or have their
    * rank mass redistributed uniformly across all nodes each superstep
    * (`dmass div n` added to every node's in-sum before damping), the
    * standard teleport treatment, still in order-independent integer
    * arithmetic so results stay bit-deterministic.
    *
    * Scale shape: the edge list is cached once; each iteration is one
    * join of the ~|V|-row rank table onto the edge list plus one
    * partial-aggregated sum per destination — the classic Pregel
    * superstep expressed relationally. The dangling mass is a ONE-ROW
    * aggregate cross-joined back (broadcast, no shuffle); |V| and the
    * dangling count come from ONE scalar job over the cached
    * node-degree frame (degree 0 ⇔ dangling), the same pattern GraphX's
    * `numVertices` uses. Lineage stays `iters` deep, no checkpoint
    * needed at 3 iterations. */
  private[graft] def pagerankOnEdges(edges0: DataFrame, iters: Int,
      redistributeDangling: Boolean): DataFrame = {
    // Edges are shuffled ONCE, to hash(dst) — the message-aggregation
    // key. Every superstep then joins the (tiny, |V|-row) share table
    // onto the cached edge list and aggregates messages per dst: when
    // the share side broadcasts (AQE converts it at runtime; any sane
    // |V| ≪ |E| graph), the join preserves the cached dst-partitioning
    // and the per-iteration groupBy(dst) needs NO exchange — the
    // Pregel "partition edges once, aggregate messages in place" shape.
    val edges = graft.CacheScope.track(
      edges0.select(col("src"), col("dst")).repartition(col("dst")).persist())
    // ONE shuffle derives the node set AND the out-degrees together:
    // every src endpoint contributes weight 1, every dst endpoint
    // weight 0 (membership only) — deg == 0 IS the dangling marker, so
    // |V| and the dangling count come from a single scalar job instead
    // of a distinct + count + anti-join count trio.
    val nodeDeg = graft.CacheScope.track(
      edges.select(col("src").as("node"), lit(1L).as("out"))
        .union(edges.select(col("dst").as("node"), lit(0L).as("out")))
        .groupBy(col("node")).agg(sum(col("out")).as("deg")).persist())
    val counts = nodeDeg.agg(
      count(lit(1)).as("n"),
      sum(when(col("deg") === 0L, 1L).otherwise(0L)).as("nd")).head()
    val n = counts.getLong(0)
    require(n > 0, "pagerank: empty edge list")
    val nDangling = counts.getLong(1)
    require(redistributeDangling || nDangling == 0,
      s"pagerank: $nDangling dangling node(s) (no out-edges) — their rank " +
        "mass would silently vanish; set spark.graft.pagerank.dangling=true " +
        "to redistribute it uniformly, or repair the edge list")
    val rInit = SCALE / n
    val base = 15L * rInit / 100L
    // deg rides inside the rank frame, so a superstep never re-joins a
    // separate degree table: share = rank div deg needs no join at all,
    // and the in-sum lands back on the cached nodeDeg frame directly.
    var ranks = nodeDeg.select(col("node"), col("deg"), lit(rInit).as("rank"))
    for (_ <- 1 to iters) {
      val shares = ranks.filter(col("deg") > 0L)
        .select(col("node"), expr("rank div deg").as("share"))
      val insums = edges.join(shares, edges("src") === shares("node"))
        .groupBy(col("dst"))
        .agg(sum(col("share")).as("insum"))
        .select(col("dst").as("node"), col("insum"))
      ranks =
        if (nDangling == 0) {
          // left join for generality: a node in a no-dangling graph may
          // still RECEIVE nothing — coalesce absent in-sums to 0
          nodeDeg.join(insums, Seq("node"), "left")
            .select(col("node"), col("deg"),
              (lit(base) +
                expr("(85 * coalesce(insum, 0L)) div 100")).as("rank"))
        } else {
          val dmass = ranks.filter(col("deg") === 0L)
            .agg(coalesce(sum(col("rank")), lit(0L)).as("dmass"))
          nodeDeg.join(insums, Seq("node"), "left")
            .crossJoin(broadcast(dmass))
            .select(col("node"), col("deg"),
              (lit(base) +
                expr(s"(85 * (coalesce(insum, 0L) + dmass div $n)) div 100"))
                .as("rank"))
        }
    }
    ranks.select(col("node"), col("rank"))
  }

  /** HITS (hubs & authorities, Kleinberg 1999) on the DIRECTED
    * part→supplier graph induced by lineitem: a part is a hub (it
    * "points at" every supplier that ever shipped it), a supplier is an
    * authority. Two unnormalized iterations:
    * auth₁ = in-degree, hub₁ = Σ auth₁ over out-edges,
    * auth₂ = Σ hub₁ over in-edges.
    *
    * Determinism stance (same as [[pagerank]]): HITS normalization is a
    * global positive scalar per iteration — it rescales, never reorders
    * — so skipping it keeps every operation an order-independent
    * integer SUM, bit-identical across engines and partitionings, with
    * no fixed-point division at all. Magnitudes grow like deg per
    * iteration (score ≤ maxdeg²·maxdeg after these two), so int64 holds
    * through billion-edge graphs with degree ≤ ~10⁶; more iterations at
    * that scale would re-introduce per-round max-normalization (integer
    * div, still deterministic).
    *
    * Scale shape: the distinct edge list is cached once; each half-step
    * is one join of a |V|-row score table onto the edges (AQE
    * broadcasts it) plus one partial-aggregated sum — two Pregel
    * supersteps, no global sort, lineage depth 2. */
  def hits(s: SparkSession, d: String): DataFrame = {
    // NOT widened (measured r21: 2.2 → 3.1 s widened — unlike pagerank's
    // edge distinct, these (p, sup) pairs are ~all-distinct, so the
    // partial agg combines nothing and the added exchange is pure cost)
    val edges = graft.CacheScope.track(
      lineitem(s, d)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sup"))
        .distinct().persist())
    val auth1 = edges.groupBy(col("sup")).agg(count(lit(1)).as("auth1"))
    val hub1 = edges.join(auth1, "sup")
      .groupBy(col("p")).agg(sum(col("auth1")).as("hub1"))
    val auth2 = edges.join(hub1, "p")
      .groupBy(col("sup")).agg(sum(col("hub1")).as("auth2"))
    hub1.select(lit("part").as("node_type"), col("p").as("node_id"),
        col("hub1").as("score"))
      .unionByName(auth2.select(lit("supplier").as("node_type"),
        col("sup").as("node_id"), col("auth2").as("score")))
      .orderBy(col("node_type"), col("node_id"))
  }

  // --------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> (pagerank _),
    "q_hits" -> (hits _)
  )

  val oracle: Map[String, String] = Map(
    // the same two unnormalized iterations — pure integer sums, so the
    // only cross-engine care is DuckDB's SUM(BIGINT) → HUGEINT cast back
    "q_hits" ->
      """WITH e AS (
        |  SELECT DISTINCT l_partkey AS p, l_suppkey AS sup FROM lineitem),
        |a1 AS (
        |  SELECT sup, CAST(COUNT(*) AS BIGINT) AS auth1 FROM e GROUP BY sup),
        |h1 AS (
        |  SELECT p, CAST(SUM(auth1) AS BIGINT) AS hub1
        |  FROM e JOIN a1 USING (sup) GROUP BY p),
        |a2 AS (
        |  SELECT sup, CAST(SUM(hub1) AS BIGINT) AS auth2
        |  FROM e JOIN h1 USING (p) GROUP BY sup)
        |SELECT 'part' AS node_type, p AS node_id, hub1 AS score FROM h1
        |UNION ALL
        |SELECT 'supplier' AS node_type, sup AS node_id, auth2 AS score FROM a2
        |ORDER BY node_type, node_id""".stripMargin,

    // the same three fixed-point iterations unrolled — `//` is the same
    // floor division `div` is, and all sums are integer sums
    "q_pagerank" ->
      """WITH e0 AS (
        |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |dg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY 1),
        |c AS (
        |  SELECT 1000000000000 // COUNT(*) AS r_init,
        |    15 * (1000000000000 // COUNT(*)) // 100 AS base
        |  FROM dg),
        |r0 AS (SELECT node, deg, (SELECT r_init FROM c) AS rank FROM dg),
        |r1 AS (
        |  SELECT d2.node, d2.deg,
        |    (SELECT base FROM c) + (85 * SUM(r0.rank // r0.deg)) // 100 AS rank
        |  FROM e JOIN r0 ON e.src = r0.node JOIN dg d2 ON e.dst = d2.node
        |  GROUP BY d2.node, d2.deg),
        |r2 AS (
        |  SELECT d2.node, d2.deg,
        |    (SELECT base FROM c) + (85 * SUM(r1.rank // r1.deg)) // 100 AS rank
        |  FROM e JOIN r1 ON e.src = r1.node JOIN dg d2 ON e.dst = d2.node
        |  GROUP BY d2.node, d2.deg),
        |r3 AS (
        |  SELECT d2.node,
        |    (SELECT base FROM c) + (85 * SUM(r2.rank // r2.deg)) // 100 AS rank
        |  FROM e JOIN r2 ON e.src = r2.node JOIN dg d2 ON e.dst = d2.node
        |  GROUP BY d2.node)
        |SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
        |  node // 2 AS node_id, CAST(rank AS BIGINT) AS rank_fp
        |FROM r3 ORDER BY node_type, node_id""".stripMargin
  )
}
