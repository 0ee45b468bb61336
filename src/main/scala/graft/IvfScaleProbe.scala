package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions.col

/** Diagnostic main: the IVF partition-pruning fraction at corpus scale.
  *
  * For each dir argument, builds (or reuses) `q_knn_ivf_scaled_served`'s
  * standing index — cell count k = ⌈√N⌉ ([[Similarity.scaledCellCount]])
  * — and prints one JSON line with the vector count, trained cell
  * universe, the standard 30-query batch's probed-cell count (the
  * literal INSET the serve plan pushes as a partition filter), and the
  * probed/universe fraction. The probed set is bounded by the batch
  * (≤ 30 × nprobe) while the universe grows as √N, so the fraction
  * FALLS with corpus size — the pruning win the oracle-pinned 16-cell
  * face cannot show (it probes ~all 16 cells at any fixture SF).
  * Numbers land in NOTES.md's round table.
  *
  * Usage: runMain graft.IvfScaleProbe <sfDir> [<sfDir2> ...]
  */
object IvfScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IvfScaleProbe <sfDir> [<sfDir2> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val n = Tables.embeddings(spark, dir).count()
      // serve once — builds the scaled index behind its marker if cold
      Similarity.knnIvfScaledServed(spark, dir).write
        .mode("overwrite").format("noop").save()
      val idx = TempDirs.scratchFor("graft_ivfindex_",
        TempDirs.sessionKey(spark, dir)).resolve("served_ivf_scaled").toString
      val universe = spark.read.parquet(idx + "/_ivf_centroids").count()
      val probed = Similarity.ivfProbes(
        Tables.embeddings(spark, dir).filter(col("vec_id") < 30)
          .select(col("vec_id"), col("embedding")), idx)._2.length
      CacheScope.releaseAll()
      spark.catalog.clearCache()
      println(f"""{"dir":"$dir","n_vectors":$n,"k":${Similarity.scaledCellCount(n)},""" +
        f""""cell_universe":$universe,"cells_probed":$probed,""" +
        f""""probed_frac":${probed.toDouble / universe}%.3f}""")
    }
    spark.stop()
  }
}
