package graft

import java.nio.file.{Files, Path, Paths}

/** Per-invocation staging directories for operators that must execute a
  * physical write to prove their claim (compaction, epoch-shard writes,
  * stream restart). Two requirements drive the shape:
  *
  *  - UNIQUENESS: a fixed path keyed by `dataDir.hashCode` lets two
  *    concurrent drivers on the same dataset stomp each other's staging
  *    files mid-read (and hashCode can alias across different dirs), so
  *    every invocation gets a fresh `Files.createTempDirectory` under an
  *    operator-named prefix.
  *  - CLEANUP: the frames these operators return are often lazy reads
  *    over the staged files, so deleting eagerly would break the caller's
  *    action. Instead each root is registered with ONE JVM shutdown hook
  *    that deletes recursively — bench loops and test suites stop
  *    accumulating unbounded tmp litter without racing live readers.
  *    Operators that materialize their result eagerly may also call
  *    [[delete]] themselves the moment the files are no longer needed.
  */
object TempDirs {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(p => delete(p))
    }, "graft-tempdirs-cleanup"))

  /** Fresh unique directory under java.io.tmpdir, deleted at JVM exit. */
  def scratch(prefix: String): Path = {
    hookInstalled
    val p = Files.createTempDirectory(Paths.get(sys.props("java.io.tmpdir")), prefix)
    registered.add(p)
    p
  }

  private val keyed =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Path]()

  /** Session-stable scratch dir per (prefix, key) — for catalog faces
    * that stage a full derived artifact (pair report, gram index) per
    * invocation: Bench reps=3 plus ScaleSmoke's base+scaled passes would
    * otherwise accumulate several complete copies in /tmp before the
    * exit hook fires. Re-entry with the same key returns the SAME dir;
    * the caller's `write.mode("overwrite")` refreshes content in place.
    * Hazard, accepted and documented: a frame returned by a PREVIOUS
    * invocation that is still lazily unread becomes invalid at the next
    * same-key overwrite — catalog/bench consumers always exhaust the
    * frame before re-entry, which is the use this exists for. Callers
    * keyed by a DATASET must scope the key with [[sessionKey]]: two
    * sessions in one JVM (the pattern the cluster-sharing machinery
    * supports) staging the same dataset would otherwise overwrite each
    * other's files mid-read — exactly the stomping hazard the header
    * names. */
  def scratchFor(prefix: String, key: String): Path = {
    hookInstalled
    keyed.computeIfAbsent((prefix, key), _ => {
      val p = Files.createTempDirectory(
        Paths.get(sys.props("java.io.tmpdir")), prefix)
      registered.add(p)
      p
    })
  }

  // identityHashCode is NOT unique (two live sessions can collide, and a
  // GC'd session's hash can be reused) — assign each session a
  // monotonically increasing id instead. WeakHashMap: keys are held
  // weakly so dead sessions drop out; SparkSession inherits Object
  // reference equality, so lookups are identity lookups. Ids are never
  // reused, so a dropped entry can never alias a later session's key.
  private val sessionIds = new java.util.WeakHashMap[AnyRef, java.lang.Long]()
  private val sessionSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** [[scratchFor]] key scoping `dataset` to ONE SparkSession (identity,
    * not equality — sessions don't override equals): within a session
    * the sequential overwrite-reuse contract applies; across sessions
    * the staged dirs are disjoint, so neither can stomp the other's
    * files mid-read. */
  def sessionKey(session: AnyRef, dataset: String): String = {
    val id = sessionIds.synchronized {
      val existing = sessionIds.get(session)
      if (existing != null) existing
      else {
        val n = java.lang.Long.valueOf(sessionSeq.incrementAndGet())
        sessionIds.put(session, n)
        n
      }
    }
    s"$id:$dataset"
  }

  /** A session-reused root with a FRESH `sub` underneath: the staging
    * contract of the catalog `_indexed`/staging faces. The subdir is
    * deleted on entry, so every invocation's build is a full fresh
    * build (bench bills build+serve honestly, and a conf change that
    * alters the staged content — e.g. `winnow.evalMod` changing the
    * train slice — can never merge into a stale append-mode index);
    * the ROOT is reused per (prefix, session, dataset), so Bench
    * reps=3 plus ScaleSmoke passes no longer accumulate whole index
    * copies in /tmp until JVM exit. Same documented hazard as
    * [[scratchFor]]: a lazily-unread frame from a PREVIOUS invocation
    * breaks at re-entry — catalog/bench consumers exhaust frames before
    * re-entry. */
  def freshUnder(prefix: String, key: String, sub: String): Path = {
    val p = scratchFor(prefix, key).resolve(sub)
    delete(p)
    p
  }

  // one lock object per (prefix, key, sub) — never removed (the map is
  // bounded by the number of distinct served artifacts a session touches)
  private val buildLocks = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), Object]()

  /** Build-once staging behind a completed-build marker — the `_served`
    * catalog faces' contract, shared so the protocol can't drift across
    * the index families. Runs `build` only when the marker is absent,
    * unreadable, or records a different `fingerprint` (callers encode
    * the input files PLUS every conf that shapes the artifact), or when
    * the artifact directory itself is gone (an externally-deleted
    * artifact must rebuild, not serve a nonexistent path); the marker
    * is deleted BEFORE and rewritten only AFTER a completed build, so a
    * crash mid-build leaves no marker and the next entry rebuilds
    * instead of serving a torn artifact. SYNCHRONIZED per (prefix, key,
    * sub): two concurrent SAME-fingerprint invocations observe exactly
    * one build — without the lock both could miss the marker and
    * interleave delete/build into one directory, a torn index that
    * neither the crash marker nor the fingerprint would catch (both
    * writers finish, the second marker write blesses the mix). The
    * lock does NOT protect serving: a later entry with a DIFFERENT
    * fingerprint (conf retune, dataset rewrite) deletes and rebuilds
    * under any still-lazy frame a prior caller holds — the same
    * documented exhaust-before-re-entry hazard as [[scratchFor]], now
    * conditional on a fingerprint change instead of every re-entry.
    * Returns the artifact path and whether this call built it (the
    * faces' build counters hang off that). */
  def buildOnce(prefix: String, key: String, sub: String, fingerprint: String)
      (build: Path => Unit): (Path, Boolean) = {
    val lock = buildLocks.computeIfAbsent((prefix, key, sub), _ => new Object)
    lock.synchronized {
      val root = scratchFor(prefix, key)
      val artifact = root.resolve(sub)
      val marker = root.resolve(s"$sub.done")
      // tolerant read: a marker that vanishes or turns unreadable between
      // exists() and read degrades to rebuild, never to a crash
      val recorded =
        try {
          if (Files.exists(marker))
            Some(new String(Files.readAllBytes(marker),
              java.nio.charset.StandardCharsets.UTF_8))
          else None
        } catch { case _: java.io.IOException => None }
      val fresh = recorded.contains(fingerprint) && Files.exists(artifact)
      if (fresh) (artifact, false)
      else {
        Files.deleteIfExists(marker)
        delete(artifact)
        build(artifact)
        Files.write(marker,
          fingerprint.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (artifact, true)
      }
    }
  }

  /** Best-effort recursive delete (exit hook + eager callers). */
  def delete(root: Path): Unit =
    if (Files.exists(root)) {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
      finally s.close()
    }
}
