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
    val e0 = lineitem(s, d)
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val dangling = s.conf.getOption("spark.graft.pagerank.dangling")
      .exists(_.toBoolean)
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
    * aggregate cross-joined back (broadcast, no shuffle); the |V| and
    * dangling counts are two scalar jobs up front — the same pattern
    * GraphX's `numVertices` uses. Lineage stays `iters` deep, no
    * checkpoint needed at 3 iterations. */
  private[graft] def pagerankOnEdges(edges0: DataFrame, iters: Int,
      redistributeDangling: Boolean): DataFrame = {
    val edges = graft.CacheScope.track(
      edges0.select(col("src"), col("dst")).persist())
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
    val nodes = graft.CacheScope.track(
      edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct().persist())
    val n = nodes.count()
    require(n > 0, "pagerank: empty edge list")
    val nDangling = nodes.join(deg, Seq("node"), "left_anti").count()
    require(redistributeDangling || nDangling == 0,
      s"pagerank: $nDangling dangling node(s) (no out-edges) — their rank " +
        "mass would silently vanish; set spark.graft.pagerank.dangling=true " +
        "to redistribute it uniformly, or repair the edge list")
    val rInit = SCALE / n
    val base = 15L * rInit / 100L
    var ranks = nodes.select(col("node"), lit(rInit).as("rank"))
    for (_ <- 1 to iters) {
      val shares = ranks.join(deg, Seq("node"))
        .select(col("node"), expr("rank div deg").as("share"))
      val insums = edges.join(shares, edges("src") === shares("node"))
        .groupBy(col("dst"))
        .agg(sum(col("share")).as("insum"))
        .select(col("dst").as("node"), col("insum"))
      ranks =
        if (nDangling == 0) {
          // no left-join/coalesce needed: every node has an in-edge source
          // in a symmetric graph iff it has out-edges, but in a general
          // no-dangling graph a node may still RECEIVE nothing — keep the
          // left join for generality, coalescing absent in-sums to 0
          nodes.join(insums, Seq("node"), "left")
            .select(col("node"),
              (lit(base) +
                expr("(85 * coalesce(insum, 0L)) div 100")).as("rank"))
        } else {
          val dmass = ranks.join(deg, Seq("node"), "left_anti")
            .agg(coalesce(sum(col("rank")), lit(0L)).as("dmass"))
          nodes.join(insums, Seq("node"), "left")
            .crossJoin(broadcast(dmass))
            .select(col("node"),
              (lit(base) +
                expr(s"(85 * (coalesce(insum, 0L) + dmass div $n)) div 100"))
                .as("rank"))
        }
    }
    ranks
  }

  // --------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> (pagerank _)
  )

  val oracle: Map[String, String] = Map(
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
