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

  /** [[scratchFor]] key scoping `dataset` to ONE SparkSession (identity,
    * not equality — sessions don't override hashCode): within a session
    * the sequential overwrite-reuse contract applies; across sessions
    * the staged dirs are disjoint, so neither can stomp the other's
    * files mid-read. */
  def sessionKey(session: AnyRef, dataset: String): String =
    s"${System.identityHashCode(session)}:$dataset"

  /** Best-effort recursive delete (exit hook + eager callers). */
  def delete(root: Path): Unit =
    if (Files.exists(root)) {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
      finally s.close()
    }
}
