package graft

import org.apache.spark.sql.functions._

import graft.functions.KllQuantiles
import graft.operators.{Curation, EventsOps, TextAnalysis}

/** Specs for the round-6 additions: KLL mergeable quantile sketches,
  * epoch shuffle, SCD2 history, Gopher filter. */
class SketchCurateSpec extends SparkFunSuite {

  // ------------------------------------------------------------ KLL

  test("KLL merge aggregator: empty identity, merged N exact, rank error bounded") {
    import KllQuantiles._
    val n = 10000
    val data = (0 until n).map(_.toDouble)
    def sketchOf(xs: Seq[Double]): Array[Byte] = {
      val s = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
      xs.foreach(s.update); s.toByteArray
    }
    val (a, b) = data.splitAt(n / 3)
    val ab = KllMergeAggregator.merge(sketchOf(a), sketchOf(b))
    // identity
    assert(KllMergeAggregator.merge(Array.emptyByteArray, ab) === ab)
    assert(KllMergeAggregator.merge(ab, Array.emptyByteArray) === ab)
    // merged sketch retains the exact total count
    val heap = org.apache.datasketches.kll.KllDoublesSketch
      .heapify(org.apache.datasketches.memory.Memory.wrap(ab))
    assert(heap.getN === n.toLong)
    // k=200 → 99%-conf normalized rank error ~1.65%; assert a loose 5%
    for (r <- Seq(0.1, 0.5, 0.9)) {
      val est = estimate(ab, r)
      assert(math.abs(est / n - r) < 0.05,
        s"rank $r estimated member $est (expected near ${r * n})")
    }
  }

  test("KLL partition sketches: merged estimates stable under repartitioning") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("v"))
    def p50(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
      KllQuantiles.partitionSketches(df, "flag", "v", 200)
        .groupBy(col("flag"))
        .agg(udaf(KllQuantiles.KllMergeAggregator,
            org.apache.spark.sql.Encoders.BINARY)
          .apply(col("sketch")).as("sk"))
        .collect()
        .map(r => r.getString(0) ->
          KllQuantiles.estimate(r.getAs[Array[Byte]](1), 0.5))
        .toMap
    val one = p50(li.repartition(1))
    val many = p50(li.repartition(16))
    // randomized compaction → not bit-identical, but both are members
    // within the sketch's rank error of the true median
    val exact = li.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("flag")).orderBy(col("v"))))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("nr"), collect_list(struct(col("rn"), col("v"))).as("xs"))
    exact.collect().foreach { r =>
      val flag = r.getString(0); val nr = r.getLong(1)
      val xs = r.getSeq[org.apache.spark.sql.Row](2)
        .map(x => x.getInt(0) -> x.getDouble(1)).toMap
      for (m <- Seq(one, many)) {
        val est = m(flag)
        // rank of the estimate must land within ±10% of 0.5
        val rank = xs.values.count(_ <= est).toDouble / nr
        assert(math.abs(rank - 0.5) < 0.10,
          s"flag=$flag est=$est lands at rank $rank")
      }
    }
  }

  // ------------------------------------------------------------ epoch shuffle

  test("epoch shuffle: deterministic, 8 shards, seed changes the permutation") {
    val docs = Tables.documents(spark, sf)
    val a1 = Curation.epochShuffleAssign(docs, "ep1")
      .select(col("doc_id"), col("shard")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = Curation.epochShuffleAssign(docs, "ep1")
      .select(col("doc_id"), col("shard")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 === a2) // pure function of (seed, doc_id)
    assert(a1.values.toSet.subsetOf((0 to 7).toSet))
    val b = Curation.epochShuffleAssign(docs, "ep2")
      .select(col("doc_id"), col("shard")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val moved = a1.count { case (id, s) => b(id) != s }
    // ~7/8 of docs move shard under a fresh seed
    assert(moved > a1.size / 2, s"only $moved of ${a1.size} docs re-sharded")
    // rough uniformity: no shard more than 3x the ideal share
    val hist = a1.values.groupBy(identity).view.mapValues(_.size)
    assert(hist.values.max <= 3 * a1.size / 8 + 1)
  }

  // ------------------------------------------------------------ SCD2

  test("scd2 history: contiguous versions, interval chaining, open tail") {
    val rows = EventsOps.scd2History(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, h) =>
      val sorted = h.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to sorted.length))
      sorted.sliding(2).foreach {
        case Array(cur, nxt) =>
          assert(cur.getLong(4) === nxt.getLong(3)) // valid_to == next valid_from
          assert(cur.getString(2) !== nxt.getString(2)) // type actually changed
        case _ =>
      }
      assert(sorted.last.getLong(4) === -1L) // open current version
    }
  }

  // ------------------------------------------------------------ gopher

  test("gopher filter: per-source counts partition the corpus") {
    val res = TextAnalysis.gopherFilter(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(res.map(_.getLong(1)).sum === total)
    res.foreach { r =>
      val nDocs = r.getLong(1); val nKeep = r.getLong(2)
      assert(nKeep <= nDocs)
      // each fail counter is bounded by the source size
      (3 to 6).foreach(i => assert(r.getLong(i) <= nDocs))
    }
    // the battery must actually discriminate on the synthetic corpus
    assert(res.map(_.getLong(2)).sum < total)
  }
}
