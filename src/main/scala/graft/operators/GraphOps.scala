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
    * both directions. Every node has degree ≥ 1 by construction, so
    * there are no dangling-mass corrections.
    *
    * Scale shape: the edge list is built once (one distinct = one
    * shuffle) and cached; each iteration is one join of the ~|V|-row rank
    * table onto the edge list plus one partial-aggregated sum per
    * destination — the classic Pregel superstep expressed relationally.
    * Three iterations = three shuffles of |V| rows each riding the
    * edges' partitioning; lineage stays 3 deep, no checkpoint needed.
    * (The graph's |V| count is one scalar job up front — the same
    * pattern GraphX's `numVertices` uses.) */
  def pagerank(s: SparkSession, d: String): DataFrame = {
    val e0 = lineitem(s, d)
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = graft.CacheScope.track(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))).persist())
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
    val n = deg.count()
    val rInit = SCALE / n
    val base = 15L * rInit / 100L
    var ranks = deg.select(col("node"), lit(rInit).as("rank"))
    for (_ <- 1 to 3) {
      val shares = ranks.join(deg, "node")
        .select(col("node"), expr("rank div deg").as("share"))
      ranks = edges.join(shares, edges("src") === shares("node"))
        .groupBy(col("dst"))
        .agg(sum(col("share")).as("insum"))
        .select(col("dst").as("node"),
          (lit(base) + expr("(85 * insum) div 100")).as("rank"))
    }
    ranks
      .select(
        when(col("node") % 2 === 0, "part").otherwise("supplier").as("node_type"),
        expr("node div 2").as("node_id"),
        col("rank").as("rank_fp"))
      .orderBy(col("node_type"), col("node_id"))
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
