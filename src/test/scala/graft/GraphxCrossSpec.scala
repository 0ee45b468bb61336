package graft

import org.apache.spark.graphx.{Edge, Graph}

import graft.operators.Dedup

/** Independent cross-validation of the hand-built connected-components
  * clustering: the SAME MinHash pair set fed to GraphX's RDD-based
  * ConnectedComponents (a completely different execution path — Pregel
  * over RDDs vs the engine's contracted min-label DataFrame loop) must
  * produce the identical component labeling, since both label with the
  * minimum reachable id. This is the second independent referee for
  * dedupClusters after the DuckDB recursive CTE (which cannot run at
  * big SFs — GraphX can). */
class GraphxCrossSpec extends SparkFunSuite {

  test("dedupClusters labeling equals GraphX ConnectedComponents on the same edges") {
    val pairs = Dedup.dedupMinhash(spark, sf)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    CacheScope.releaseAll()
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheScope.releaseAll()
    assume(pairs.nonEmpty, "no near-dup pairs at this SF")

    val edges = spark.sparkContext.parallelize(
      pairs.toSeq.map { case (a, b) => Edge(a, b, 1) })
    val cc = Graph.fromEdges(edges, 0).connectedComponents()
      .vertices.collect().toMap

    assert(clusters.keySet === cc.keySet,
      "engine and GraphX disagree on which docs are clustered at all")
    val disagreements = clusters.collect {
      case (doc, cid) if cc(doc) != cid => (doc, cid, cc(doc))
    }
    assert(disagreements.isEmpty,
      s"label mismatches (doc, engine, graphx): ${disagreements.take(5).mkString(", ")}")
    info(s"${clusters.size} clustered docs, " +
      s"${clusters.values.toSet.size} components — identical under GraphX")
  }
}
