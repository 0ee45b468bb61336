package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Pins the staging-directory contract behind every `_indexed`/staging
  * catalog face: session-scoped key UNIQUENESS (two sessions must never
  * share a scratch root, even if their identity hashes collide) and
  * [[TempDirs.freshUnder]]'s reuse-root / fresh-subdir semantics (reps
  * must not accumulate index copies, and a conf-changed rebuild must
  * never merge into stale append-mode content). */
class TempDirsSpec extends AnyFunSuite {

  test("sessionKey assigns distinct keys to distinct objects and is stable per object") {
    val a = new Object
    val b = new Object
    val ka = TempDirs.sessionKey(a, "ds1")
    val kb = TempDirs.sessionKey(b, "ds1")
    assert(ka !== kb, "two live sessions must never share a key")
    assert(ka === TempDirs.sessionKey(a, "ds1"), "key must be stable for one session")
    assert(ka !== TempDirs.sessionKey(a, "ds2"), "datasets must stay disjoint")
    // ids are monotone counters, never identity hashes: many objects in a
    // row must all be distinct (identityHashCode offers no such guarantee)
    val keys = (1 to 100).map(_ => TempDirs.sessionKey(new Object, "d")).toSet
    assert(keys.size === 100)
  }

  test("scratchFor returns the same root per key, distinct roots across keys") {
    val k1 = TempDirs.sessionKey(new Object, "x")
    val k2 = TempDirs.sessionKey(new Object, "x")
    val r1 = TempDirs.scratchFor("graft_tdspec_", k1)
    assert(r1 === TempDirs.scratchFor("graft_tdspec_", k1))
    assert(r1 !== TempDirs.scratchFor("graft_tdspec_", k2))
  }

  test("buildOnce: builds on cold/mismatched fingerprint, skips on match, rebuilds after crash") {
    val key = TempDirs.sessionKey(new Object, "z")
    var builds = 0
    def enter(fp: String) = TempDirs.buildOnce("graft_tdspec_", key, "art", fp) { p =>
      Files.createDirectories(p)
      Files.writeString(p.resolve("data"), fp)
      builds += 1
    }
    val (p1, b1) = enter("fpA")
    assert(b1 && builds === 1, "cold entry must build")
    val (p2, b2) = enter("fpA")
    assert(!b2 && builds === 1 && p1 === p2, "matching fingerprint must serve")
    val (_, b3) = enter("fpB")
    assert(b3 && builds === 2, "changed fingerprint must rebuild")
    assert(Files.readString(p1.resolve("data")) === "fpB",
      "rebuild must start from a cleared artifact dir")
    // crash window: a missing marker (deleted before build, written only
    // after) must force a rebuild even though artifact files exist
    Files.deleteIfExists(
      TempDirs.scratchFor("graft_tdspec_", key).resolve("art.done"))
    val (_, b4) = enter("fpB")
    assert(b4 && builds === 3, "a markerless artifact was served")
    // inverse window: a matching marker whose artifact directory was
    // externally deleted must rebuild, not serve a nonexistent path
    TempDirs.delete(p1)
    val (p5, b5) = enter("fpB")
    assert(b5 && builds === 4, "a marker with no artifact was served")
    assert(Files.exists(p5.resolve("data")))
  }

  test("buildOnce: concurrent same-face entries observe exactly one build") {
    val key = TempDirs.sessionKey(new Object, "race")
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val torn = new java.util.concurrent.atomic.AtomicInteger(0)
    val n = 8
    val start = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val tasks = (1 to n).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            start.await()
            val (p, built) = TempDirs.buildOnce(
              "graft_tdspec_", key, "raceart", "fpR") { dir =>
              builds.incrementAndGet()
              Files.createDirectories(dir)
              Files.writeString(dir.resolve("data"), "partial")
              Thread.sleep(50) // widen the torn-interleave window
              Files.writeString(dir.resolve("data"), "complete")
            }
            // every caller — builder or server — must observe a COMPLETED
            // artifact; reading "partial" means a build interleaved with
            // a serve or another build
            if (Files.readString(p.resolve("data")) != "complete")
              torn.incrementAndGet()
            built
          }
        })
      }
      start.countDown()
      val builtFlags = tasks.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(builds.get() === 1,
        s"${builds.get()} concurrent builds ran — the lock is not holding")
      assert(builtFlags.count(identity) === 1,
        "exactly one caller must report built=true")
      assert(torn.get() === 0, s"${torn.get()} callers observed a torn artifact")
    } finally pool.shutdownNow()
  }

  test("freshUnder reuses the root but clears the subdir on every entry") {
    val key = TempDirs.sessionKey(new Object, "y")
    val p1 = TempDirs.freshUnder("graft_tdspec_", key, "idx")
    Files.createDirectories(p1)
    val stale = p1.resolve("part-stale.parquet")
    Files.writeString(stale, "old index content")
    val p2 = TempDirs.freshUnder("graft_tdspec_", key, "idx")
    assert(p1 === p2, "root+subdir path must be reused (no /tmp accumulation)")
    assert(!Files.exists(stale),
      "stale content must be gone — an append-mode rebuild must start empty")
    // sibling subdirs under the same root are untouched
    val sib = TempDirs.freshUnder("graft_tdspec_", key, "other")
    Files.createDirectories(sib)
    val keep = sib.resolve("keep")
    Files.writeString(keep, "x")
    TempDirs.freshUnder("graft_tdspec_", key, "idx")
    assert(Files.exists(keep), "clearing one subdir must not touch siblings")
  }
}
