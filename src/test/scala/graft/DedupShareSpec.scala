package graft

import graft.operators.{Curation, Dedup}

/** Cross-query sharing of the dedup clusters intermediate
  * (`spark.graft.dedup.shareClusters`). The contract under test:
  * producer-pays — `dedupClusters` always runs the full MinHash→CC
  * pipeline and publishes a snapshot; `dedupRepresentative` reuses the
  * snapshot instead of re-running the most expensive job in the catalog.
  * Output must be bit-identical in every mode, because the DuckDB oracle
  * replays the unshared computation. */
class DedupShareSpec extends SparkFunSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val r = df.collect().map(_.toString).toSeq
    CacheScope.releaseAll()
    r
  }

  private def withShare(body: => Unit): Unit =
    try {
      spark.conf.set("spark.graft.dedup.shareClusters", "true")
      body
    } finally {
      spark.conf.unset("spark.graft.dedup.shareClusters")
      Dedup.clearPublishedClusters()
    }

  test("conf on: representative reuses the published clusters — pipeline runs once") {
    val baselineClusters = rows(Dedup.dedupClusters(spark, sf))
    val baselineRep = rows(Curation.dedupRepresentative(spark, sf))
    withShare {
      Dedup.clearPublishedClusters()
      val before = Dedup.clusterPipelineRuns.get()
      val sharedClusters = rows(Dedup.dedupClusters(spark, sf))
      val sharedRep = rows(Curation.dedupRepresentative(spark, sf))
      assert(Dedup.clusterPipelineRuns.get() - before === 1L,
        "representative re-ran the pair pipeline despite a published snapshot")
      assert(sharedClusters === baselineClusters)
      assert(sharedRep === baselineRep)
    }
  }

  test("conf on: a lone representative computes (and publishes) once, then reuses") {
    withShare {
      Dedup.clearPublishedClusters()
      val before = Dedup.clusterPipelineRuns.get()
      val first = rows(Curation.dedupRepresentative(spark, sf))
      val second = rows(Curation.dedupRepresentative(spark, sf))
      assert(Dedup.clusterPipelineRuns.get() - before === 1L,
        "fallback compute did not publish for the next consumer")
      assert(first === second)
    }
  }

  test("conf on: the producer never reuses — each dedupClusters call recomputes") {
    withShare {
      Dedup.clearPublishedClusters()
      val before = Dedup.clusterPipelineRuns.get()
      rows(Dedup.dedupClusters(spark, sf))
      rows(Dedup.dedupClusters(spark, sf))
      assert(Dedup.clusterPipelineRuns.get() - before === 2L,
        "a stale snapshot hid the producer's own cost")
    }
  }

  test("conf off (default): no snapshot is consulted or published") {
    Dedup.clearPublishedClusters()
    val before = Dedup.clusterPipelineRuns.get()
    rows(Dedup.dedupClusters(spark, sf))
    rows(Curation.dedupRepresentative(spark, sf))
    assert(Dedup.clusterPipelineRuns.get() - before === 2L)
  }

  test("a result-shaping conf flip invalidates the published snapshot") {
    // the fingerprint covers exactCollapse / lsh.maxBucket / geometry:
    // with shareClusters on, flipping one mid-session must force a
    // recompute — serving a snapshot computed under the OTHER mode
    // diverges precisely in the hot-bucket case where the modes differ
    withShare {
      Dedup.clearPublishedClusters()
      val before = Dedup.clusterPipelineRuns.get()
      rows(Dedup.dedupClusters(spark, sf))
      assert(Dedup.clusterPipelineRuns.get() - before === 1L)
      try {
        spark.conf.set("spark.graft.dedup.exactCollapse", "true")
        rows(Curation.dedupRepresentative(spark, sf))
        assert(Dedup.clusterPipelineRuns.get() - before === 2L,
          "a snapshot computed with exactCollapse OFF was served after the flip")
        // the recompute republished under the new fingerprint: a second
        // consumer read in the same conf state reuses it
        rows(Curation.dedupRepresentative(spark, sf))
        assert(Dedup.clusterPipelineRuns.get() - before === 2L)
      } finally spark.conf.unset("spark.graft.dedup.exactCollapse")
      // back on the original confs the old-fingerprint snapshot is gone
      // (evicted at the miss) — the producer-pays contract recomputes
      rows(Curation.dedupRepresentative(spark, sf))
      assert(Dedup.clusterPipelineRuns.get() - before === 3L)
    }
  }

  test("snapshot survives CacheScope release and catalog clearCache") {
    withShare {
      Dedup.clearPublishedClusters()
      val before = Dedup.clusterPipelineRuns.get()
      rows(Dedup.dedupClusters(spark, sf))
      // the between-queries cleanup Bench/Verify run must not evict the
      // published snapshot (it is lineage-truncated, not CacheManager'd)
      CacheScope.releaseAll()
      spark.catalog.clearCache()
      val rep = rows(Curation.dedupRepresentative(spark, sf))
      assert(Dedup.clusterPipelineRuns.get() - before === 1L,
        "between-query cache cleanup evicted the published snapshot")
      assert(rep.nonEmpty)
    }
  }
}
