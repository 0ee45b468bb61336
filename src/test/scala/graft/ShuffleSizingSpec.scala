package graft

import org.scalatest.funsuite.AnyFunSuite

/** The corpus-sized shuffle-partition rule
  * ([[GraftConf.sizedShufflePartitions]]): clamps, linearity, and the
  * round-17 calibration points the dial was set by. Pure-function spec
  * — the smoke applies the rule per measured corpus (ScaleSmoke
  * autoSizePartitions), so a wrong number here IS a wrong partition
  * count there. */
class ShuffleSizingSpec extends AnyFunSuite {

  private val target = GraftConf.DefaultShuffleTargetBytes

  test("fixture corpora clamp to the CPU floor — the A/B-measured best count") {
    // round-17 A/B (NOTES, reps=3 on the clean x10 corpus): 121
    // partitions read 1.2-2.2x SLOWER than 32 across the mid-size pair
    // families, so every fixture-scale corpus must land ON the floor
    assert(GraftConf.sizedShufflePartitions(1400L * 1024, 32) === 32) // sf0.1
    assert(GraftConf.sizedShufflePartitions(12L * 1024 * 1024, 32) === 32) // x10
    assert(GraftConf.sizedShufflePartitions(0L, 32) === 32)
    assert(GraftConf.sizedShufflePartitions(-1L, 4) === 4) // hostile input clamps, not throws
  }

  test("the hot-phase factor puts the skewed x10 corpus at the adjudicated count") {
    // the round-16/17 hot bm25_batch adjudication: ~128 partitions read
    // 37.5-53.4 s tight where 32 read 45.8-132 s spill-bound — the
    // phase-level skew factor (x4) over the floor reproduces it
    val hot = ScaleSmoke.sizedWithFactor(12L * 1024 * 1024, 32, target,
      ScaleSmoke.HotShufflePartitionsFactor)
    assert(hot === 128, s"hot-phase count drifted to $hot")
  }

  test("the hot-skew factor cannot punch through the partition cap") {
    // factor x cap on a TB corpus would be pure scheduling tax — the
    // smoke re-clamps AFTER multiplying (round-17 advisor finding)
    assert(ScaleSmoke.sizedWithFactor(1L << 50, 32, target,
      ScaleSmoke.HotShufflePartitionsFactor)
      === GraftConf.DefaultShufflePartitionCap)
    // and the factor is a no-op above cap/factor but below cap: clamped
    val nearCap = ScaleSmoke.sizedWithFactor(
      2000L * target, 32, target, ScaleSmoke.HotShufflePartitionsFactor)
    assert(nearCap === GraftConf.DefaultShufflePartitionCap,
      s"2000-partition corpus x4 must clamp to the cap, got $nearCap")
  }

  test("cluster-scale inputs grow linearly between the clamps") {
    val oneX = GraftConf.sizedShufflePartitions(100L * target, 4)
    val tenX = GraftConf.sizedShufflePartitions(1000L * target, 4)
    assert(oneX === 100 && tenX === 1000)
    // a 10 GiB compressed corpus lands in the thousands, a 100 TB one
    // at the cap — the regime the bytes rule exists for
    assert(GraftConf.sizedShufflePartitions(10L << 30, 32) === 2560)
  }

  test("expansion-aware sizing: fixture floors, TB differentiation, legacy fallback") {
    // round-19 calibration (GraftConf.ShuffleExpansionPerCorpusByte
    // scaladoc). Fixture scale: even the heaviest measured factor (x62,
    // containment) over the 11.4 MiB x10 smoke corpus stays under the
    // cpu floor — fleet walls are unchanged by the feature
    val x10 = 12L * 1024 * 1024
    for (q <- GraftConf.ShuffleExpansionPerCorpusByte.keys)
      assert(GraftConf.expansionSizedPartitions(q, x10, 32) === 32,
        s"$q must stay on the floor at fixture scale")
    // TB scale: counts scale with each family's MEASURED shuffle bytes,
    // not one global assumption — at 10 GiB compressed corpus the x62
    // containment family wants ~40x the partitions of the x0.8 winnow
    // family (both uncapped at this size)
    val tenGiB = 10L << 30
    val heavy = GraftConf.expansionSizedPartitions("q_dedup_containment", tenGiB, 32,
      cap = 1 << 20)
    val light = GraftConf.expansionSizedPartitions("q_winnow_matches", tenGiB, 32,
      cap = 1 << 20)
    // against the SNAPSHOT factors (refreshed each round from the smoke
    // artifact — hardcoding last round's values here is exactly the
    // staleness the divergence guard below exists to kill)
    val fHeavy = GraftConf.ShuffleExpansionPerCorpusByte("q_dedup_containment")
    val fLight = GraftConf.ShuffleExpansionPerCorpusByte("q_winnow_matches")
    assert(heavy === math.ceil(tenGiB * fHeavy / GraftConf.DefaultTargetShuffleBytes).toInt)
    assert(light === math.ceil(tenGiB * fLight / GraftConf.DefaultTargetShuffleBytes).toInt)
    assert(fHeavy / fLight > 10.0 &&
      heavy > light * (fHeavy / fLight) * 0.9 && heavy < light * (fHeavy / fLight) * 1.1,
      s"family differentiation lost: heavy=$heavy light=$light")
    // the default cap still bounds everything
    assert(GraftConf.expansionSizedPartitions("q_dedup_containment", tenGiB, 32)
      === GraftConf.DefaultShufflePartitionCap)
    // a family with NO measured factor sizes EXACTLY as the legacy
    // input rule (16x expansion against the 64 MiB shuffle target is
    // algebraically the 4 MiB input target)
    for (bytes <- Seq(0L, 1L << 20, 123456789L, 10L << 30, 1L << 42))
      assert(GraftConf.expansionSizedPartitions("q_unmeasured", bytes, 32)
        === GraftConf.sizedShufflePartitions(bytes, 32),
        s"legacy equivalence broke at $bytes bytes")
  }

  test("independent per-family ceilings: snapshot factors stay inside hardcoded absolute bounds") {
    // The TB-differentiation test above reads the SNAPSHOT map, and the
    // divergence guard below reads the ARTIFACT the same round refreshes
    // the snapshot from — so a wrongly-refreshed factor could sail
    // through both (round-20 verdict finding). These bounds are
    // deliberately HARDCODED, not derived from either source: one
    // absolute sanity ceiling/floor per family class, wide enough that
    // honest re-measures never trip them, tight enough that an
    // orders-of-magnitude refresh mistake (units, wrong denominator,
    // swapped rows) fails CI by name. Update them only with a hand-checked
    // measurement in the commit message.
    val bounds = Map( // family -> (min, max) shuffle bytes per corpus byte
      "q_dedup_containment" -> (20.0, 130.0),
      "q_dedup_ngram" -> (15.0, 90.0),
      "q_dedup_minhash" -> (8.0, 60.0),
      "q_bm25_batch" -> (1.0, 25.0),
      "q_bm25_batch_indexed" -> (1.0, 25.0),
      "q_dedup_clusters" -> (0.5, 15.0),
      "q_curation_pipeline" -> (2.0, 25.0),
      "q_bpe_merges" -> (1.5, 20.0),
      "q_span_dedup" -> (0.8, 12.0),
      "q_winnow_contamination" -> (0.3, 6.0))
    for ((q, (lo, hi)) <- bounds) {
      val f = GraftConf.ShuffleExpansionPerCorpusByte(q)
      assert(f >= lo && f <= hi,
        s"$q snapshot factor $f outside its hardcoded sanity bound [$lo, $hi] " +
          "— if the new measurement is real, update the bound by hand")
    }
  }

  test("expansionFactorsFrom: parses the artifact, degrades to empty on every bad shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sizingspec_")
    val p = dir.resolve("shuffle_profile.json")
    // current format: factors = scaled_shuffle_write_mb / scaled_corpus_mb
    java.nio.file.Files.writeString(p,
      """{"phase":"shuffle_profile","base_corpus_mb":1.30,"scaled_corpus_mb":11.40,""" +
        """"rows":[{"query":"q_a","scaled_input_mb":393.0,"scaled_shuffle_write_mb":701.5},""" +
        """{"query":"q_b","base_shuffle_write_mb":1.0}]}""" + "\n")
    val m = GraftConf.expansionFactorsFrom(p.toString)
    assert(math.abs(m("q_a") - 701.5 / 11.4) < 1e-9)
    assert(!m.contains("q_b"), "a row without a scaled side must be skipped, not zeroed")
    // pre-round-20 format (no corpus field) → empty, never a guess from
    // per-query input bytes (whose denominator is not the corpus)
    java.nio.file.Files.writeString(p,
      """{"phase":"shuffle_profile","rows":[{"query":"q_a","scaled_shuffle_write_mb":7.0}]}""")
    assert(GraftConf.expansionFactorsFrom(p.toString) === Map.empty)
    // absent / malformed → empty, never a throw
    assert(GraftConf.expansionFactorsFrom(dir.resolve("absent.json").toString) === Map.empty)
    java.nio.file.Files.writeString(p, "not json")
    assert(GraftConf.expansionFactorsFrom(p.toString) === Map.empty)
  }

  test("artifact factors override the snapshot in sizing; absent families fall back") {
    val tenGiB = 10L << 30
    val measured = Map("q_dedup_containment" -> 31.0)
    val fromArtifact = GraftConf.expansionSizedPartitions(
      "q_dedup_containment", tenGiB, 32, cap = 1 << 20, factors = measured)
    assert(fromArtifact ===
      math.ceil(tenGiB * 31.0 / GraftConf.DefaultTargetShuffleBytes).toInt,
      "sizing must consume the artifact factor, not the x62 snapshot")
    // a family the artifact lacks still sizes from the snapshot
    assert(GraftConf.expansionSizedPartitions(
      "q_dedup_ngram", tenGiB, 32, cap = 1 << 20, factors = measured) ===
      GraftConf.expansionSizedPartitions("q_dedup_ngram", tenGiB, 32, cap = 1 << 20))
  }

  test("snapshot-vs-artifact divergence guard: no stale factor survives >2x off the measured file") {
    // the round-19 lesson: bm25's factor moved x37-44 -> x5-8 within ONE
    // round's rework, and nothing failed. This guard reads the repo's
    // standing SCALESMOKE_shuffle_latest.json; once it carries the
    // corpus field (every round-20+ fleet run writes it), any snapshot
    // entry >2x off the measured factor fails CI by name — refresh
    // GraftConf.ShuffleExpansionPerCorpusByte from the artifact.
    val measured = GraftConf.expansionFactorsFrom("SCALESMOKE_shuffle_latest.json")
    assume(measured.nonEmpty,
      "standing artifact predates the corpus field — guard arms on the next fleet run")
    val drifted = GraftConf.ShuffleExpansionPerCorpusByte.toSeq.sorted.flatMap {
      case (q, snap) => measured.get(q).collect {
        // sub-2x factors are broadcast-regime noise (0.1 vs 0.25 is a
        // rounding story, and both floor at fixture scale anyway): only
        // families whose larger side is >= 2x corpus can mis-size
        case meas if math.max(snap, meas) >= 2.0 &&
          math.max(snap, meas) / math.min(snap, meas) > 2.0 =>
          f"$q: snapshot $snap vs measured $meas%.1f"
      }
    }
    assert(drifted.isEmpty,
      s"stale expansion snapshot (refresh ShuffleExpansionPerCorpusByte " +
        s"from the artifact): ${drifted.mkString("; ")}")
  }

  test("the cap bounds task-count blowup; degenerate arguments fail fast by name") {
    assert(GraftConf.sizedShufflePartitions(1L << 50, 32) === 4096)
    assert(GraftConf.sizedShufflePartitions(1L << 50, 32, cap = 256) === 256)
    intercept[IllegalArgumentException] {
      GraftConf.sizedShufflePartitions(1L, 0)
    }
    intercept[IllegalArgumentException] {
      GraftConf.sizedShufflePartitions(1L, 32, targetBytes = 0)
    }
    intercept[IllegalArgumentException] {
      GraftConf.sizedShufflePartitions(1L, 32, cap = 8) // cap < cpus
    }
  }
}
