package graft
import graft.operators.Similarity
import org.apache.spark.sql.functions.col
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001","/root/testdata/sf0.01")) {
      val brute3 = Similarity.knnBrute(spark, sf).filter(col("rn") <= 3).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      def recall(df: org.apache.spark.sql.DataFrame): Double = {
        val got = df.filter(col("qid") < 20).collect()
          .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
        brute3.intersect(got).size.toDouble / brute3.size
      }
      for (it <- 0 to 4) {
        val r = recall(Similarity.knnIvfImpl(spark, sf, it))
        val obj = Similarity.ivfTop2(spark, sf, it)
          .filter(col("crk") === 1)
          .agg(org.apache.spark.sql.functions.avg(col("cs"))).head().getDouble(0)
        println(f"RECALL $sf iters=$it r=$r%.4f obj=$obj%.4f")
        CacheScope.releaseAll(); spark.catalog.clearCache()
      }
      // PQ: recall@3 of ADC scoring with seed vs Lloyd-refined codebooks
      // (PqSpec pins that refinement monotonically cuts quantization
      // error; this measures whether that translates to recall)
      for (it <- 0 to 3) {
        spark.conf.set("spark.graft.pq.lloydIters", it.toString)
        try {
          val r = recall(Similarity.knnPq(spark, sf))
          println(f"PQRECALL $sf iters=$it r=$r%.4f")
        } finally spark.conf.unset("spark.graft.pq.lloydIters")
        CacheScope.releaseAll(); spark.catalog.clearCache()
      }
      CacheScope.releaseAll(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
