package graft

import org.scalatest.funsuite.AnyFunSuite

/** The corpus-sized shuffle-partition rule
  * ([[GraftConf.sizedShufflePartitions]]): clamps, linearity, and the
  * round-16 calibration point the dial was set by. Pure-function spec —
  * the smoke applies the rule per measured corpus (ScaleSmoke
  * autoSizePartitions), so a wrong number here IS a wrong partition
  * count there. */
class ShuffleSizingSpec extends AnyFunSuite {

  private val target = GraftConf.DefaultShuffleTargetBytes

  test("small fixtures clamp to the CPU floor — base-corpus runs keep their pinned count") {
    // sf0.1 documents+embeddings ≈ 1.4 MiB: far under 32 × 96 KiB
    assert(GraftConf.sizedShufflePartitions(1400L * 1024, 32) === 32)
    assert(GraftConf.sizedShufflePartitions(0L, 32) === 32)
    assert(GraftConf.sizedShufflePartitions(-1L, 4) === 4) // hostile input clamps, not throws
  }

  test("the round-16 calibration point: a ~13 MiB x10 corpus lands in the measured-good band") {
    // the hot bm25_batch adjudication: 32 partitions spill-bound,
    // 128 reads 1.7x faster with 6x tighter spread — the rule must put
    // a corpus of that size at >= 128, and not overshoot past ~4x it
    val n = GraftConf.sizedShufflePartitions(13L * 1024 * 1024, 32)
    assert(n >= 128 && n <= 512, s"x10 corpus sized to $n partitions")
  }

  test("partitions grow linearly with bytes between the clamps") {
    val oneX = GraftConf.sizedShufflePartitions(100L * target, 4)
    val tenX = GraftConf.sizedShufflePartitions(1000L * target, 4)
    assert(oneX === 100 && tenX === 1000)
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
