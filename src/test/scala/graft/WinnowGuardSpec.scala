package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Adversarial hot-FINGERPRINT fixtures for the conf-gated winnowing
  * match guard (`spark.graft.winnow.maxDocsPerFp`) — the same input
  * hazard as an LSH hot bucket: one boilerplate fingerprint shared by m
  * docs makes the fp self-equi-join emit m²/2 pairs. The guard must
  * (a) bound the join by DROPPING hot fingerprints (MOSS's own
  * common-fragment elimination — a fragment in thousands of docs
  * identifies no specific pair), (b) leave cold fingerprints
  * bit-identical, and (c) be a provable no-op when the cap exceeds
  * every fingerprint's doc count (the adaptive probe runs the exact
  * unguarded plan), so the oracle-gated default semantics are
  * unchanged. */
class WinnowGuardSpec extends SparkFunSuite {

  /** Synthetic selection frame driven straight into the
    * [[TextAnalysis.winnowMatchesOf]] seam: 100 boilerplate docs all
    * sharing fps {1,2,3} (each fp hot: 100 docs), one cold pair
    * (1000, 1001) sharing fps {10,11,12} (each fp in 2 docs), and one
    * doc (2000) overlapping the cold pair on only 2 fps — below
    * minShared. */
  private lazy val selected = {
    import spark.implicits._
    val hot = (0L until 100L).flatMap(d => Seq(1L, 2L, 3L).map(fp => (d, fp, fp)))
    val cold = Seq(1000L, 1001L).flatMap(d => Seq(10L, 11L, 12L).map(fp => (d, fp, fp)))
    val sub = Seq(10L, 11L).map(fp => (2000L, fp, fp))
    (hot ++ cold ++ sub).toDF("doc_id", "pos", "fp")
  }

  private def pairs(cap: Int) =
    TextAnalysis.winnowMatchesOf(selected, minShared = 3, cap = cap).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Long]("n_shared")))
      .toSet

  test("hot fingerprints are dropped from pair counting; cold pairs survive exactly") {
    val guarded = pairs(cap = 50)
    // the 100-doc boilerplate group emits ZERO pairs — not 100·99/2
    assert(!guarded.exists { case (d1, d2, _) => d1 < 100L && d2 < 100L },
      "hot-fingerprint pairs leaked through the guard")
    // the cold pair is untouched: all 3 shared fps still counted
    assert(guarded === Set((1000L, 1001L, 3L)))
    CacheScope.releaseAll()
  }

  test("unguarded baseline goes quadratic on the same fixture (what the guard prevents)") {
    val unguarded = pairs(cap = 0)
    assert(unguarded.size === 100 * 99 / 2 + 1)
    assert(unguarded.contains((1000L, 1001L, 3L)))
  }

  test("cap above every fingerprint is set-identical to unguarded (adaptive cold path)") {
    val unguarded = pairs(cap = 0)
    val bigCap = pairs(cap = 1000000)
    assert(bigCap === unguarded)
    CacheScope.releaseAll()
  }

  test("conf wiring: winnow.maxDocsPerFp reaches winnowMatches; big cap equals default") {
    val default = TextAnalysis.winnowMatches(spark, sf).collect().map(_.toString).sorted.toSeq
    spark.conf.set("spark.graft.winnow.maxDocsPerFp", "1000000")
    try {
      val bigCap = TextAnalysis.winnowMatches(spark, sf).collect().map(_.toString).sorted.toSeq
      assert(bigCap === default)
    } finally {
      spark.conf.unset("spark.graft.winnow.maxDocsPerFp")
      CacheScope.releaseAll()
    }
  }
}
