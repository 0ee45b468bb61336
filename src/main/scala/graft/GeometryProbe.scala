package graft

import graft.operators.Dedup

/** Diagnostic main: measures what the LSH band geometry dial
  * (`spark.graft.lsh.bands` × `.rowsPerBand`) actually buys — for each
  * geometry, the banded pair count, the brute-force signature-truth pair
  * count at the same width (banding recall = banded/truth: the banding
  * stage is the only lossy step, the match filter is shared), and the
  * wall time of the banded pipeline. Numbers land in NOTES.md; the
  * equal-width rows (2x4 / 4x2 / 1x8) also illustrate the containment
  * law GeometrySpec pins. Probe-only: the truth computation is an
  * all-pairs nested-loop join, fine at sf0.001, never a catalog path.
  */
object GeometryProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    for ((b, r) <- Seq((2, 4), (4, 2), (1, 8), (4, 4), (20, 5))) {
      spark.conf.set("spark.graft.lsh.bands", b.toString)
      spark.conf.set("spark.graft.lsh.rowsPerBand", r.toString)
      try {
        val t0 = System.nanoTime()
        val banded = Dedup.dedupMinhash(spark, sf).count()
        val tBanded = (System.nanoTime() - t0) / 1e9
        CacheScope.releaseAll(); spark.catalog.clearCache()
        val truth = Dedup.bruteMinhashPairs(spark, sf).count()
        CacheScope.releaseAll(); spark.catalog.clearCache()
        val recall = if (truth == 0) 1.0 else banded.toDouble / truth
        println(f"GEOM ${b}%dx$r%d width=${b * r}%d banded=$banded%d " +
          f"truth=$truth%d recall=$recall%.4f t=$tBanded%.2fs")
      } finally {
        spark.conf.unset("spark.graft.lsh.bands")
        spark.conf.unset("spark.graft.lsh.rowsPerBand")
      }
    }
    spark.stop()
  }
}
