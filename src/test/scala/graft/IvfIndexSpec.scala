package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The persisted IVF index face ([[Similarity.writeIvfIndex]] /
  * [[Similarity.knnFromIvfIndex]]): train-once/serve-from-disk must be
  * BIT-equal to the in-query [[Similarity.knnIvf]] (same centroids, same
  * kernel expressions), and serving must actually prune posting-list
  * directories — the scan reads the probed cells, not the corpus. */
class IvfIndexSpec extends SparkFunSuite {

  private def descend(p: SparkPlan): Seq[SparkPlan] =
    p +: (p.children.flatMap(descend) ++ (p match {
      case a: AdaptiveSparkPlanExec => descend(a.executedPlan)
      case q: QueryStageExec        => descend(q.plan)
      case _                        => Nil
    }))

  test("indexed serving is bit-equal to the in-query IVF path, both SFs") {
    for (d <- Seq(sf, "/root/testdata/sf0.01")) {
      val direct = Similarity.knnIvf(spark, d).collect().map(_.toString).toSeq
      CacheScope.releaseAll()
      val served = Similarity.knnIvfIndexed(spark, d).collect().map(_.toString).toSeq
      CacheScope.releaseAll()
      assert(served === direct, s"at $d")
    }
  }

  test("posting-list scan prunes to the probed cell directories") {
    val path = TempDirs.scratch("graft_ivfspec_").resolve("ivf").toString
    Similarity.writeIvfIndex(spark, sf, path)
    CacheScope.releaseAll()
    // 2 queries x nprobe<=2 cells: at most 4 of the 16 directories
    val served = Similarity.knnFromIvfIndex(
      Tables.embeddings(spark, sf).filter(col("vec_id") < 2)
        .select(col("vec_id"), col("embedding")),
      path)
    served.collect()
    val scans = descend(served.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("graft_ivfspec_")) => f
    }
    assert(scans.nonEmpty, "no file scan over the index found:\n" +
      served.queryExecution.executedPlan.toString.take(3000))
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty, "probe filter must land on the partition column")
    val prunedDirs = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.values.toString).distinct
    assert(prunedDirs.size <= 4,
      s"expected <= 4 probed cell dirs, scan reads ${prunedDirs.size}")
    // and the unfiltered index really does have more cells than that
    val allCells = spark.read.parquet(path).select(col("cell")).distinct().count()
    assert(allCells > 4, s"fixture degenerate: only $allCells cells")
  }

  test("frozen-quantizer growth: appended twins are served, replays append nothing") {
    val path = TempDirs.scratch("graft_ivfspec3_").resolve("ivf").toString
    Similarity.writeIvfIndex(spark, sf, path)
    CacheScope.releaseAll()
    val n0 = spark.read.parquet(path).count()
    // append exact copies of vectors 40..44 under shifted ids: each is a
    // perfect near-duplicate its source vector's query must retrieve
    val twins = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= 40 && col("vec_id") < 45)
      .select((col("vec_id") + 9000).as("vec_id"), col("embedding"))
    Similarity.appendToIvfIndex(twins, path)
    assert(spark.read.parquet(path).count() === n0 + 5)
    // at-least-once replay: same batch again is a no-op
    Similarity.appendToIvfIndex(twins, path)
    assert(spark.read.parquet(path).count() === n0 + 5)
    val served = Similarity.knnFromIvfIndex(
      Tables.embeddings(spark, sf)
        .filter(col("vec_id") >= 40 && col("vec_id") < 45)
        .select(col("vec_id"), col("embedding")),
      path).collect()
    for (q <- 40 until 45) {
      val top = served.filter(r => r.getLong(0) == q && r.getLong(2) == 1L).head
      assert(top.getLong(1) === q + 9000,
        s"query $q must retrieve its appended twin first")
      assert(top.getDouble(3) === 1.0)
    }
  }

  test("the centroid sidecar is invisible to a plain read of the posting lists") {
    val path = TempDirs.scratch("graft_ivfspec2_").resolve("ivf").toString
    Similarity.writeIvfIndex(spark, sf, path)
    CacheScope.releaseAll()
    val cols = spark.read.parquet(path).columns.toSet
    assert(cols === Set("vec_id", "embedding", "cell"))
    val cents = spark.read.parquet(path + "/_ivf_centroids")
    assert(cents.count() === 16)
    assert(cents.columns.toSet === Set("cent_id", "cvec", "cnrm"))
  }
}
