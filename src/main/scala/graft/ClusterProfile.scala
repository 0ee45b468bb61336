package graft

import graft.operators.Dedup

/** Diagnostic main: stage-level cost breakdown of q_dedup_clusters —
  * the catalog's most expensive query. Each stage prefix runs COLD
  * (caches dropped between runs, like Bench), so subtraction gives each
  * stage's marginal share: signatures (MinHash agg), + band join & pair
  * emission, + CC fixpoint & cluster assembly. Numbers land in NOTES.md
  * as the denominator for future geometry work. */
object ClusterProfile {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").collect() // warmup
    def cold[A](body: => A): (A, Double) = {
      CacheScope.releaseAll(); spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    for (rep <- 1 to 3) {
      val (_, tSig) = cold(Dedup.profileSignatures(spark, sf))
      val (nPairs, tPairs) = cold(Dedup.profilePairs(spark, sf))
      val (rounds, tCc) = cold(Dedup.profileCc(spark, sf))
      val (_, tFull) = cold(
        Dedup.dedupClusters(spark, sf).write.mode("overwrite")
          .format("noop").save())
      println(f"CLUSTERS $sf rep=$rep sig=$tSig%.2fs " +
        f"pairs=$tPairs%.2fs (pairs=$nPairs%d) " +
        f"cc=$tCc%.2fs (rounds=$rounds%d) full=$tFull%.2fs " +
        f"marginal: bandjoin=${tPairs - tSig}%.2fs ccAssembly=${tFull - tPairs}%.2fs")
    }
    spark.stop()
  }
}
