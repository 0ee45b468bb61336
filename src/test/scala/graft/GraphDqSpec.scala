package graft

import org.apache.spark.sql.functions._

import graft.operators.{DataQuality, Dedup, EventsOps, GraphOps}

/** Specs for the graph / data-quality / containment batch, plus
  * cross-form checks for the events-analytics queries. */
class GraphDqSpec extends SparkFunSuite {

  // ------------------------------------------------------------ pagerank

  test("pagerank: rank mass conserved, hubs outrank leaves") {
    val rows = GraphOps.pagerank(spark, sf).collect()
    try {
      val total = rows.map(_.getLong(2)).sum
      val SCALE = 1000000000000L
      // integer floor-division truncation is the only mass loss
      assert(total <= SCALE && total > SCALE * 99 / 100,
        s"rank mass $total vs scale $SCALE")
      // suppliers are the high-degree side of the bipartite graph — the
      // top-ranked node must be one, and their mean rank must dominate
      val (sup, part) = rows.partition(_.getString(0) == "supplier")
      assert(sup.nonEmpty && part.nonEmpty)
      assert(sup.map(_.getLong(2)).max > part.map(_.getLong(2)).max)
      assert(sup.map(_.getLong(2)).sum / sup.length >
        part.map(_.getLong(2)).sum / part.length)
    } finally CacheScope.releaseAll()
  }

  test("pagerank refuses dangling nodes loudly; redistribution conserves mass") {
    import spark.implicits._
    val SCALE = 1000000000000L
    // node 4 is a genuine sink: reachable (1→4) but no out-edges
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      GraphOps.pagerankOnEdges(edges, iters = 2, redistributeDangling = false)
    }
    CacheScope.releaseAll()
    assert(ex.getMessage.contains("dangling"), ex.getMessage)
    assert(ex.getMessage.contains("spark.graft.pagerank.dangling"))
    // with redistribution on, the sink's mass is teleported uniformly —
    // total mass stays within integer-truncation loss of SCALE, which
    // without the correction would leak ~rank(4) ≈ SCALE/4 per iteration
    val ranks = GraphOps.pagerankOnEdges(
      edges, iters = 2, redistributeDangling = true).collect()
    CacheScope.releaseAll()
    assert(ranks.length === 4)
    val total = ranks.map(_.getLong(1)).sum
    assert(total <= SCALE && total > SCALE * 99 / 100,
      s"dangling mass leaked: total $total vs scale $SCALE")
    // determinism: the integer arithmetic reproduces bit-for-bit
    val again = GraphOps.pagerankOnEdges(
      edges, iters = 2, redistributeDangling = true).collect()
    CacheScope.releaseAll()
    assert(ranks.map(_.toString).sorted === again.map(_.toString).sorted)
  }

  // ------------------------------------------------------------ containment

  test("containment prefix filter is completeness-preserving vs brute force") {
    graft.functions.VectorFunctions.register(spark)
    val sh = Tables.documents(spark, sf).select(col("doc_id"), col("source"),
      expr("""CASE WHEN length(text) >= 3
             |  THEN array_sort(array_distinct(transform(
             |    sequence(1, length(text) - 2), i -> xxhash64(substring(text, i, 3)))))
             |  ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin)
        .as("shingles"))
    // quadratic within-source brute force — no prefix filter, no size gate
    val brute = sh.as("a").join(sh.as("b"),
        col("a.source") === col("b.source") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        expr("sorted_intersect(a.shingles, b.shingles)").as("inter"),
        size(col("a.shingles")).as("n1"))
      .filter(lit(5) * col("inter") >= lit(4) * col("n1") && col("n1") > 0)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = Dedup.dedupContainment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    CacheScope.releaseAll()
    assert(fast === brute, s"prefix filter dropped ${(brute -- fast).size} " +
      s"pairs / invented ${(fast -- brute).size}")
    assert(fast.nonEmpty)
  }

  test("containment is genuinely directed on this corpus") {
    val pairs = Dedup.dedupContainment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    CacheScope.releaseAll()
    val oneWay = pairs.count { case (a, b) => !pairs.contains((b, a)) }
    // the subset-duplicate shape: most containments must NOT be mutual
    assert(oneWay * 2 > pairs.size, s"$oneWay one-way of ${pairs.size}")
  }

  // ------------------------------------------------------------ dq audit

  test("dq audit: full battery reported, violations match direct recount") {
    val rows = DataQuality.dqAudit(spark, sf).collect()
    assert(rows.length === 8)
    assert(rows.forall(_.getLong(2) > 0)) // every rule checked something
    val byRule = rows.map(r => r.getString(0) -> r).toMap
    // pass column is exactly n_violations == 0
    rows.foreach(r => assert(r.getBoolean(4) === (r.getLong(3) == 0L)))
    // the has-lineitem rule's count equals a direct anti-join
    val expected = Tables.orders(spark, sf).join(
        Tables.lineitem(spark, sf).select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"), "left_anti").count()
    assert(byRule("ref_orders_has_lineitem").getLong(3) === expected)
    // known-clean constraints on the synthetic data actually pass
    assert(byRule("unique_o_orderkey").getBoolean(4))
    assert(byRule("ref_orders_customer").getBoolean(4))
  }

  // ------------------------------------------------------------ leakage-safe split

  test("leakage-safe split: the naive per-doc split WOULD leak, the group split can't") {
    def toSplit(h: String): String =
      if (h <= "c") "train" else if (h <= "e") "val" else "test"
    val md = java.security.MessageDigest.getInstance("MD5")
    def naiveSplit(id: Long): String = {
      val h = md.digest(s"split:$id".getBytes("UTF-8"))
      toSplit("%02x".format(h(0)).substring(0, 1))
    }
    val clusters = operators.Dedup.dedupClusters(spark, sf)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    CacheScope.releaseAll()
    assert(clusters.nonEmpty)
    // the leak the operator exists to close: under per-doc hashing, at
    // least one near-dup cluster has members in different splits (the
    // group split assigns by cluster id, so it cannot — by construction)
    val leakyUnderNaive = clusters.groupBy(_._2).count { case (_, members) =>
      members.map { case (doc, _) => naiveSplit(doc) }.toSet.size > 1
    }
    assert(leakyUnderNaive > 0, "fixture has no naive-split leakage to close")
    // the summary covers the whole corpus and records real repairs
    val rows = operators.Sampling.splitLeakageSafe(spark, sf).collect()
    CacheScope.releaseAll()
    assert(rows.map(_.getLong(1)).sum === Tables.documents(spark, sf).count())
    assert(rows.map(_.getLong(4)).sum > 0L)
  }

  // ------------------------------------------------------------ events cross-forms

  test("changelog compaction equals the row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    val viaWindow = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ms"), col("event_type"), col("value"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
        .orderBy(col("ms").desc, col("event_id").desc)))
      .withColumn("n_changes",
        count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("ms").as("last_ms"),
        col("event_type").as("last_type"), col("value").as("last_value"),
        col("n_changes"))
      .orderBy(col("user_id"))
      .collect().map(_.toString).toSeq
    val viaAgg = EventsOps.changelogCompact(spark, sf)
      .collect().map(_.toString).toSeq
    assert(viaAgg === viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("rolling distinct: sketch estimate in band, merge width bounded") {
    val rows = EventsOps.rollingDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 3L) // n_hours_merged
      assert(r.getBoolean(4), s"sketch estimate out of band at hour ${r.getLong(0)}")
    }
  }

  test("funnel counts are monotone down the steps") {
    val r = EventsOps.funnel(spark, sf).head()
    val (users, v, c, p) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(users >= v && v >= c && c >= p)
    assert(v > 0)
  }
}
