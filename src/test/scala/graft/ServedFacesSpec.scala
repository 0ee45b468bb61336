package graft

import java.nio.file.Files
import graft.operators.{Dedup, Retrieval, Similarity, TextAnalysis}

/** The `_served` faces' contract: build the persisted index at most
  * once per (session, dataset) behind a completed-build marker, serve
  * every later invocation from the warm files, output bit-equal to the
  * per-invocation `_indexed` twin (both share the scan face's oracle),
  * and invalidate on anything that changes the index content — the
  * dataset files (both faces) and, for IVF, the quantizer confs. */
class ServedFacesSpec extends SparkFunSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val r = df.collect().map(_.toString).toSeq
    CacheScope.releaseAll()
    r
  }

  /** Other suites (CatalogSpec runs the whole catalog) may have already
    * built the served index in this shared session — clear it so THIS
    * suite observes the cold build. */
  private def reset(prefix: String, sub: String): Unit = {
    val root = TempDirs.scratchFor(prefix, TempDirs.sessionKey(spark, sf))
    TempDirs.delete(root.resolve(sub))
    Files.deleteIfExists(root.resolve(s"$sub.done"))
  }

  test("bm25_batch_served: builds once, serves after, equals the per-invocation face") {
    reset("graft_postings_", "served_train")
    val viaIndexed = rows(Retrieval.bm25BatchIndexed(spark, sf))
    val b0 = Retrieval.servedBuilds.get()
    val first = rows(Retrieval.bm25BatchServed(spark, sf))
    assert(Retrieval.servedBuilds.get() === b0 + 1, "cold call must build")
    val second = rows(Retrieval.bm25BatchServed(spark, sf))
    assert(Retrieval.servedBuilds.get() === b0 + 1,
      "warm call rebuilt — the serve-only claim is then a lie")
    assert(first === viaIndexed)
    assert(second === viaIndexed)
    assert(first.nonEmpty)
    // the fixed-panel face serves the SAME artifact (no rebuild) and
    // returns exactly the full face's rows restricted to the panel —
    // per-qid results are independent of the panel's other members
    val shard = rows(Retrieval.bm25BatchShardServed(spark, sf))
    assert(Retrieval.servedBuilds.get() === b0 + 1, "shard face rebuilt")
    def qidOf(r: String) = r.drop(1).takeWhile(_ != ',').toLong
    assert(shard === first.filter(qidOf(_) < Retrieval.BatchShardPanelMax),
      "panel rows must equal the full-probe rows restricted to the panel")
    assert(shard.nonEmpty)
  }

  test("bm25_batch_served: a missing marker (crashed build) forces a rebuild") {
    rows(Retrieval.bm25BatchServed(spark, sf)) // ensure built
    val root = TempDirs.scratchFor("graft_postings_",
      TempDirs.sessionKey(spark, sf))
    Files.deleteIfExists(root.resolve("served_train.done"))
    val b0 = Retrieval.servedBuilds.get()
    val r = rows(Retrieval.bm25BatchServed(spark, sf))
    assert(Retrieval.servedBuilds.get() === b0 + 1,
      "a build without a completion marker must never be served")
    assert(r.nonEmpty)
  }

  test("winnow_contamination_served: builds once, equals the indexed face; geometry retune rebuilds") {
    reset("graft_winnowidx_", "served_train")
    val viaIndexed = rows(TextAnalysis.winnowContaminationIndexed(spark, sf))
    val b0 = TextAnalysis.servedBuilds.get()
    val first = rows(TextAnalysis.winnowContaminationServed(spark, sf))
    assert(TextAnalysis.servedBuilds.get() === b0 + 1, "cold call must build")
    rows(TextAnalysis.winnowContaminationServed(spark, sf))
    assert(TextAnalysis.servedBuilds.get() === b0 + 1, "warm call rebuilt")
    assert(first === viaIndexed)
    // a (k, w) retune must REBUILD here — the library primitive
    // (contaminationFromIndex) fails fast on the _winnow_meta sidecar
    // for the same mismatch; the served face's contract is rebuild
    try {
      spark.conf.set("spark.graft.winnow.window", "6")
      rows(TextAnalysis.winnowContaminationServed(spark, sf))
      assert(TextAnalysis.servedBuilds.get() === b0 + 2,
        "geometry retune did not rebuild (the sidecar check would have thrown)")
    } finally spark.conf.unset("spark.graft.winnow.window")
  }

  test("span served faces: ONE shared gram-index build serves both; equals the indexed twins") {
    reset("graft_gramidx_", "served_grams")
    val removalIndexed = rows(Dedup.spanRemovalIndexed(spark, sf))
    val dedupIndexed = rows(Dedup.spanDedupIndexed(spark, sf))
    val b0 = Dedup.gramServedBuilds.get()
    val removal = rows(Dedup.spanRemovalServed(spark, sf))
    assert(Dedup.gramServedBuilds.get() === b0 + 1, "cold call must build")
    val dedup = rows(Dedup.spanDedupServed(spark, sf))
    assert(Dedup.gramServedBuilds.get() === b0 + 1,
      "the sibling face rebuilt — the two span faces must SHARE one artifact")
    rows(Dedup.spanRemovalServed(spark, sf))
    assert(Dedup.gramServedBuilds.get() === b0 + 1, "warm call rebuilt")
    assert(removal === removalIndexed)
    assert(dedup === dedupIndexed)
    assert(removal.nonEmpty && dedup.nonEmpty)
    // the per-shard faces serve the SAME artifact (no rebuild) and
    // return exactly the full-probe rows restricted to the shard —
    // corpus-wide counts, shard-only output
    val shardRemoval = rows(Dedup.spanRemovalShardServed(spark, sf))
    val shardDedup = rows(Dedup.spanDedupShardServed(spark, sf))
    assert(Dedup.gramServedBuilds.get() === b0 + 1, "shard face rebuilt")
    def shardOf(full: Seq[String]) =
      full.filter(r => r.drop(1).takeWhile(_ != ',').toLong % 10 == 0)
    assert(shardRemoval === shardOf(removal),
      "shard removal rows must equal the full-probe rows restricted to the shard")
    assert(shardDedup === shardOf(dedup))
    assert(shardRemoval.nonEmpty && shardDedup.nonEmpty)
  }

  test("dedup_incremental_served: builds once, equals the indexed face; an LSH geometry retune rebuilds") {
    reset("graft_sigindex_", "served_base")
    val viaIndexed = rows(Dedup.dedupIncrementalIndexed(spark, sf))
    val b0 = Dedup.sigServedBuilds.get()
    val first = rows(Dedup.dedupIncrementalServed(spark, sf))
    assert(Dedup.sigServedBuilds.get() === b0 + 1, "cold call must build")
    rows(Dedup.dedupIncrementalServed(spark, sf))
    assert(Dedup.sigServedBuilds.get() === b0 + 1, "warm call rebuilt")
    assert(first === viaIndexed)
    assert(first.nonEmpty)
    // the fixed-batch face serves the SAME artifact (no rebuild) and
    // returns exactly the full face's rows restricted to the pinned
    // batch — per-delta-doc results are independent and the base side
    // (the standing index) is untouched by the batch predicate
    val shard = rows(Dedup.dedupIncrementalShardServed(spark, sf))
    assert(Dedup.sigServedBuilds.get() === b0 + 1, "shard face rebuilt")
    def docOf(r: String) = r.drop(1).takeWhile(_ != ',').toLong
    assert(shard === first.filter(docOf(_) < Dedup.IncShardDeltaMax),
      "batch rows must equal the full-probe rows restricted to the batch")
    assert(shard.nonEmpty && shard.size < first.size,
      "the pinned batch must be a strict subset of the sf-proportional delta")
    // band keys are a function of the geometry: a retune must REBUILD
    // here — the library primitive (dedupIncrementalFromIndex) fails
    // fast on the _lsh_geometry stamp for the same mismatch
    try {
      spark.conf.set("spark.graft.lsh.rowsPerBand", "2")
      rows(Dedup.dedupIncrementalServed(spark, sf))
      assert(Dedup.sigServedBuilds.get() === b0 + 2,
        "geometry retune served the stale bands (the stamp would have thrown)")
    } finally spark.conf.unset("spark.graft.lsh.rowsPerBand")
  }

  test("phrase/bm25 served faces: ONE shared full-corpus postings build serves both") {
    reset("graft_postings_", "served_full")
    val phraseViaIndexed = rows(Retrieval.phraseIndexed(spark, sf))
    val bm25ViaIndexed = rows(Retrieval.bm25Indexed(spark, sf))
    val b0 = Retrieval.fullServedBuilds.get()
    val ph = rows(Retrieval.phraseServed(spark, sf))
    assert(Retrieval.fullServedBuilds.get() === b0 + 1, "cold call must build")
    val bm = rows(Retrieval.bm25Served(spark, sf))
    assert(Retrieval.fullServedBuilds.get() === b0 + 1,
      "the sibling face rebuilt — phrase and bm25 must SHARE one postings artifact")
    rows(Retrieval.phraseServed(spark, sf))
    assert(Retrieval.fullServedBuilds.get() === b0 + 1, "warm call rebuilt")
    assert(ph === phraseViaIndexed)
    assert(bm === bm25ViaIndexed)
    assert(ph.nonEmpty && bm.nonEmpty)
  }

  test("knn_ivf_served: builds once, equals the indexed face; a quantizer retune rebuilds") {
    reset("graft_ivfindex_", "served_ivf")
    val viaIndexed = rows(Similarity.knnIvfIndexed(spark, sf))
    val b0 = Similarity.servedBuilds.get()
    val first = rows(Similarity.knnIvfServed(spark, sf))
    assert(Similarity.servedBuilds.get() === b0 + 1, "cold call must build")
    rows(Similarity.knnIvfServed(spark, sf))
    assert(Similarity.servedBuilds.get() === b0 + 1, "warm call rebuilt")
    assert(first === viaIndexed)
    assert(first.nonEmpty)
    // the trained quantizer depends on ivf confs: a retune must rebuild
    // rather than serve the other model's posting lists
    try {
      spark.conf.set("spark.graft.ivf.lloydIters", "2")
      rows(Similarity.knnIvfServed(spark, sf))
      assert(Similarity.servedBuilds.get() === b0 + 2,
        "conf retune served the stale model")
    } finally spark.conf.unset("spark.graft.ivf.lloydIters")
    // back on defaults the fingerprint differs from the retuned build
    rows(Similarity.knnIvfServed(spark, sf))
    assert(Similarity.servedBuilds.get() === b0 + 3)
  }

  test("knn_ivf_scaled_served: builds once at k=ceil(sqrt(N)); equals the conf'd in-query path") {
    reset("graft_ivfindex_", "served_ivf_scaled")
    val b0 = Similarity.scaledServedBuilds.get()
    val first = rows(Similarity.knnIvfScaledServed(spark, sf))
    assert(Similarity.scaledServedBuilds.get() === b0 + 1, "cold call must build")
    rows(Similarity.knnIvfScaledServed(spark, sf))
    assert(Similarity.scaledServedBuilds.get() === b0 + 1, "warm call rebuilt")
    assert(first.nonEmpty)
    // the trained universe is k = ceil(sqrt(500)) = 23 seed cells, not
    // the oracle-pinned 16 — read the centroid sidecar back (<= 23:
    // a cell that captures no member in the Lloyd step drops out)
    val root = TempDirs.scratchFor("graft_ivfindex_",
      TempDirs.sessionKey(spark, sf))
    val cents = spark.read.parquet(
      root.resolve("served_ivf_scaled").toString + "/_ivf_centroids")
    val nCells = cents.count()
    assert(nCells > 16 && nCells <= 23,
      s"scaled quantizer trained $nCells cells — expected ceil(sqrt(500))=23ish")
    // the persisted hop must be invisible: the same k through the
    // spark.graft.ivf.cells conf on the IN-QUERY path is bit-equal
    try {
      spark.conf.set("spark.graft.ivf.cells", "23")
      assert(first === rows(Similarity.knnIvf(spark, sf)))
    } finally spark.conf.unset("spark.graft.ivf.cells")
  }
}
