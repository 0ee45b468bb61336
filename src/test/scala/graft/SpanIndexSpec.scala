package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The persisted gram-count index must be a STORAGE change only: span
  * removal served from summed index partials is bit-equal to the scan
  * face's in-query corpus counts, growth is replay-safe (re-delivered
  * batches are no-ops), and conf-gated compaction preserves serving. */
class SpanIndexSpec extends SparkFunSuite {
  private val sf01 = "/root/testdata/sf0.01"

  private def scratch(prefix: String): String =
    TempDirs.scratch(prefix).resolve("grams").toString

  private def docs(d: String): DataFrame =
    spark.read.parquet(s"$d/documents.parquet").select(col("doc_id"), col("text"))

  private def removalRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("index-served removal is bit-equal to the scan face at two SFs") {
    for (d <- Seq(sf, sf01)) {
      val idx = scratch("graft_gramidx_eq_")
      try {
        Dedup.writeGramIndex(spark, d, idx)
        val served = removalRows(Dedup.spanRemovalFromIndex(docs(d), idx, minCut = 50))
        CacheScope.releaseAll()
        val scanned = removalRows(Dedup.spanRemovalOf(spark, docs(d), minCut = 50))
        assert(served === scanned, s"index hop changed the removal result at $d")
      } finally CacheScope.releaseAll()
    }
    // the sf0.01 fixture must actually cut spans, or equality is weak
    val cut = Dedup.spanRemoval(spark, sf01)
      .filter(col("n_spans_cut") > 0).count()
    CacheScope.releaseAll()
    assert(cut > 0, "sf0.01 fixture cut no spans — equality test is vacuous")
  }

  test("growth: build 70% + append 30% == build 100%; replayed batch is a no-op") {
    val idx = scratch("graft_gramidx_grow_")
    try {
      val all = docs(sf)
      val base = all.filter(col("doc_id") % 10 < 7)
      val delta = all.filter(col("doc_id") % 10 >= 7)
      Dedup.writeGramIndexOf(base, idx)
      Dedup.appendToGramIndex(delta, idx)
      val afterGrow = removalRows(Dedup.spanRemovalFromIndex(all, idx, minCut = 50))
      val rowsAfterGrow = spark.read.parquet(idx).count()
      CacheScope.releaseAll()
      // at-least-once delivery: the SAME batch arrives again
      Dedup.appendToGramIndex(delta, idx)
      val afterReplay = removalRows(Dedup.spanRemovalFromIndex(all, idx, minCut = 50))
      CacheScope.releaseAll()
      assert(afterReplay === afterGrow,
        "replayed append changed the served result — counts double-applied")
      val scanned = removalRows(Dedup.spanRemovalOf(spark, all, minCut = 50))
      assert(afterGrow === scanned, "grown index differs from a fresh full build")
      // the replay really was a no-op at the storage level too
      assert(spark.read.parquet(idx).count() === rowsAfterGrow,
        "replayed append wrote rows into the index")
    } finally CacheScope.releaseAll()
  }

  test("geometry sidecar: serving fails fast when w disagrees") {
    val idx = scratch("graft_gramidx_meta_")
    Dedup.writeGramIndexOf(docs(sf).limit(5), idx)
    // sabotage the sidecar to a different width
    spark.range(1).selectExpr("CAST(7 AS INT) AS w")
      .coalesce(1).write.mode("overwrite").parquet(idx + "/_gram_meta")
    val e = intercept[IllegalArgumentException](
      Dedup.spanRemovalFromIndex(docs(sf).limit(5), idx, minCut = 50))
    assert(e.getMessage.contains("w=7"))
  }

  test("conf-gated compaction bounds per-bucket files, serving unchanged") {
    val idx = scratch("graft_gramidx_compact_")
    try {
      val all = docs(sf)
      Dedup.writeGramIndexOf(all.filter(col("doc_id") % 10 < 5), idx)
      spark.conf.set("spark.graft.index.compactEvery", "2")
      for (m <- 5 to 9)
        Dedup.appendToGramIndex(all.filter(col("doc_id") % 10 === m), idx)
      val fs = new org.apache.hadoop.fs.Path(idx)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val maxParts = fs.listStatus(new org.apache.hadoop.fs.Path(idx))
        .filter(d => d.isDirectory && d.getPath.getName.startsWith("bucket="))
        .map(d => fs.listStatus(d.getPath)
          .count(_.getPath.getName.startsWith("part-"))).max
      assert(maxParts <= 3,
        s"compaction did not bound per-bucket files: $maxParts")
      val served = removalRows(Dedup.spanRemovalFromIndex(all, idx, minCut = 50))
      CacheScope.releaseAll()
      val scanned = removalRows(Dedup.spanRemovalOf(spark, all, minCut = 50))
      assert(served === scanned, "compaction changed the served result")
    } finally {
      spark.conf.unset("spark.graft.index.compactEvery")
      CacheScope.releaseAll()
    }
  }
}
