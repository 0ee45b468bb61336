package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import graft.operators.{Dedup, Retrieval, Similarity, TextAnalysis}

/** Partition-pruning audit for the persisted-index SERVE paths: every
  * `_served` face's claim to 100 TB cheapness is that the index read is
  * pruned to the probe's buckets/cells — a literal partition filter
  * pushed into the parquet scan. A regression that loses the filter
  * (e.g. the isin moving above a projection barrier) would silently
  * turn serving into a full index scan; the timings would only show it
  * at scale. This spec makes the plan shape a test: the index-data scan
  * must carry a non-empty `partitionFilters` on the expected partition
  * column (sidecar reads — `_postings_meta`, `_ivf_centroids`, … — root
  * BELOW the index dir and are excluded by path). For the small-probe
  * faces the pruning is also asserted to be EFFECTIVE: the executed
  * scan reads at most one file per probed bucket, not the whole index.
  *
  * (The signature/band served face is deliberately absent: its index is
  * a FLAT table by design — serving cost is bounded by the bucket JOIN
  * on band keys, not by partition pruning.) */
class ServedPruningSpec extends SparkFunSuite {

  /** FileSourceScans whose root IS the index artifact dir (ends with
    * `sub`) — sidecars root one level below and don't match. */
  private def indexScans(df: DataFrame, sub: String): Seq[FileSourceScanExec] = {
    def walk(p: SparkPlan): Seq[FileSourceScanExec] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          Seq(m.relation.cachedPlan)
        case other => other.children
      }
      (p match {
        case f: FileSourceScanExec => Seq(f)
        case _ => Nil
      }) ++ kids.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.endsWith(sub)))
  }

  /** Assert every index-data scan in `face`'s plan carries a partition
    * filter on `partCol`. Executes the frame first (finalizes AQE so
    * the walked plan is the real one) and returns the scans for
    * callers that add effectiveness checks. */
  private def assertPruned(face: => DataFrame, sub: String,
      partCol: String): Seq[FileSourceScanExec] = {
    // finally-release: a failing assertion must not leak the face's
    // persisted probe frames (the span faces persist a corpus-sized
    // gram pass) into the shared session's later suites
    try {
      val df = face
      df.queryExecution.toRdd.count()
      val scans = indexScans(df, sub)
      assert(scans.nonEmpty,
        s"no FileSourceScan over the $sub index in the executed plan — " +
          "did the serve path stop reading the persisted files?")
      scans.foreach { f =>
        assert(f.partitionFilters.nonEmpty,
          s"index scan over $sub lost its partition filter:\n$f")
        assert(f.partitionFilters.mkString(",").contains(partCol),
          s"index scan over $sub prunes on the wrong column " +
            s"(expected $partCol): ${f.partitionFilters.mkString(",")}")
      }
      scans
    } finally CacheScope.releaseAll()
  }

  test("bm25_batch_served: postings read pruned to the query terms' buckets") {
    assertPruned(Retrieval.bm25BatchServed(spark, sf), "served_train", "bucket")
    // the fixed-panel face carries the same filter over a SMALLER probe
    // — the production case the pruning exists for
    assertPruned(Retrieval.bm25BatchShardServed(spark, sf), "served_train", "bucket")
  }

  test("winnow_contamination_served: fingerprint read pruned to the eval side's buckets") {
    assertPruned(
      TextAnalysis.winnowContaminationServed(spark, sf), "served_train", "bucket")
  }

  test("knn_ivf_served: posting-list read pruned to the probed cells") {
    assertPruned(Similarity.knnIvfServed(spark, sf), "served_ivf", "cell")
  }

  test("knn_ivf_scaled_served: pruned to probed cells; INSET bounded by the batch") {
    val scans = assertPruned(
      Similarity.knnIvfScaledServed(spark, sf), "served_ivf_scaled", "cell")
    // the probed set is at most 30 queries x nprobe 2 literals however
    // large the cell universe grows — the bound that makes the probed/
    // universe fraction FALL with corpus size
    scans.foreach { f =>
      val inset = f.partitionFilters.collectFirst {
        case org.apache.spark.sql.catalyst.expressions.InSet(_, hset) => hset.size
        case org.apache.spark.sql.catalyst.expressions.In(_, list) => list.size
      }
      assert(inset.exists(_ <= 60),
        s"probed cell set must stay <= 60 literals: ${f.partitionFilters}")
    }
  }

  test("span served faces: gram-index read pruned to the probe's buckets") {
    // r20: the serve-side count origin is the `_gram_totals` sidecar
    // (bucket-partitioned like the index); the main-index read that
    // remains is the unindexed-probe membership check, which AQE
    // legitimately elides from the final plan for an indexed probe
    // (empty-relation propagation through the anti/semi joins) — so
    // the pruning contract is asserted on the sidecar scan
    assertPruned(Dedup.spanRemovalServed(spark, sf), "_gram_totals", "bucket")
    assertPruned(Dedup.spanDedupServed(spark, sf), "_gram_totals", "bucket")
    // the per-shard faces carry the same filter over a SMALLER probe —
    // the production case the pruning exists for
    assertPruned(Dedup.spanRemovalShardServed(spark, sf), "_gram_totals", "bucket")
    assertPruned(Dedup.spanDedupShardServed(spark, sf), "_gram_totals", "bucket")
  }

  test("phrase/bm25 served: pruning is EFFECTIVE — at most one file per probed term bucket") {
    // 3 fixed terms -> <= 3 of the 64 bucket partitions; the build
    // writes one file per bucket (repartition(IndexBuckets, bucket)
    // puts each bucket value in exactly one task), so the executed
    // scan's numFiles is a direct read of how many partitions survived
    val phraseBuckets = Seq("window", "fast", "query")
      .map(Retrieval.tokenBucket).distinct
    val phScans = assertPruned(Retrieval.phraseServed(spark, sf), "served_full", "bucket")
    phScans.foreach { f =>
      val n = f.metrics("numFiles").value
      assert(n >= 1 && n <= phraseBuckets.size,
        s"phrase serve read $n files for ${phraseBuckets.size} probed buckets " +
          "— the partition filter is not pruning the listing")
    }
    val bmBuckets = Seq("spark", "query", "window")
      .map(Retrieval.tokenBucket).distinct
    val bmScans = assertPruned(Retrieval.bm25Served(spark, sf), "served_full", "bucket")
    bmScans.foreach { f =>
      val n = f.metrics("numFiles").value
      assert(n >= 1 && n <= bmBuckets.size,
        s"bm25 serve read $n files for ${bmBuckets.size} probed buckets")
    }
  }
}
