package graft

import org.apache.spark.sql.SparkSession

/** Stage profile for q_dedup_ngram (the packed-binary-shingles decision
  * gate): times the shingle build, the prefix-filter candidate join, and
  * the full query (candidates + merge-walk verify) separately, so the
  * verify stage's share is measured rather than guessed. Median of 3,
  * same cleanup discipline as Bench. */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def timed(label: String)(body: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        CacheScope.releaseAll(); spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"NGRAMPROF $label median=${ts(1)}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    timed("shingles_only") {
      operators.Dedup.profileShingles(spark, sfDir)
    }
    timed("through_candidates") {
      operators.Dedup.profileCandidates(spark, sfDir)
    }
    timed("full_query") {
      operators.Dedup.dedupNgram(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
