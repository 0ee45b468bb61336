package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions.col

/** CI guard for the round-18 cell-scaling QUALITY claim: at the serve
  * face's pinned nprobe=2, the ⌈√N⌉-cell quantizer's recall@10 must not
  * fall below the 16-cell oracle face's. Everything here is
  * deterministic (first-k seeds, one Lloyd step, integer-exact centroid
  * means, fixed tie order), so a drop is a code regression, never
  * noise. The full measured table (× nprobe 2/4/8 × {sf0.1, ×10}) lives
  * in NOTES.md via `runMain graft.RecallProbe`; this spec pins only the
  * ordering the scaled face's scaladoc promises, at fixture scale. */
class IvfRecallGuardSpec extends SparkFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("recall@10 at nprobe=2: sqrt(N) cells >= 16 cells (and not degenerate)") {
    val truth = RecallProbe.bruteTopK(spark, dir, 10)
    assert(truth.nonEmpty, "brute ground truth empty — fixture degenerate")
    val queries = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 30).select(col("vec_id"), col("embedding"))
    def recallAt(cells: Int): Double = {
      val path = TempDirs.scratch(s"graft_recallguard_${cells}_")
        .resolve("idx").toString
      try {
        // the scaled face's pinned training knobs (knnIvfScaledServed)
        Similarity.writeIvfIndexModel(path, Similarity.ivfModel(
          spark, dir, lloydIters = 1, seeding = "first",
          objectiveEps = 0.0, cells = cells))
        val (res, probed) = Similarity.knnFromIvfIndexSwept(queries, path, 2, 10)
        assert(probed <= 60, s"probe INSET $probed exceeds the 30x2 batch bound")
        val got = res.collect()
          .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
        truth.intersect(got).size.toDouble / truth.size
      } finally { CacheScope.releaseAll(); spark.catalog.clearCache() }
    }
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val base = recallAt(16)
    val scaled = recallAt(Similarity.scaledCellCount(n))
    assert(scaled >= base,
      f"sqrt(N)-cell recall $scaled%.4f fell below the 16-cell face's $base%.4f " +
        "— the cell-scaling quality claim regressed")
    assert(scaled >= 0.5, f"scaled recall $scaled%.4f degenerate")
  }

  test("smoke recall helper: probing every cell equals brute force (recall 1.0)") {
    // ScaleSmoke.ivfRecall is the per-round artifact's kernel (VERDICT
    // r18 #5). Its one analytic invariant: with nprobe = the full cell
    // universe, the pruned serving path degenerates to an exact scan, so
    // recall@10 vs the brute ground truth must be exactly 1.0 — any
    // drift is a bug in the serve path or the truth kernel, not quality.
    val sfSmall = "/root/testdata/sf0.001"
    try {
      val idx = Similarity.servedIvfIndexPath(spark, sfSmall)
      assert(ScaleSmoke.ivfRecall(spark, sfSmall, idx, nprobe = 16) === 1.0)
      val pinned = ScaleSmoke.ivfRecall(spark, sfSmall, idx, nprobe = 2)
      assert(pinned > 0.0 && pinned <= 1.0, f"pinned-nprobe recall $pinned%.4f out of range")
    } finally { CacheScope.releaseAll(); spark.catalog.clearCache() }
  }
}
