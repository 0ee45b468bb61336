package graft

import java.nio.file.Files
import graft.operators.{Retrieval, Similarity, TextAnalysis}

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
}
