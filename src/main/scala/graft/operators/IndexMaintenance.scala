package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Maintenance for the persisted signature/vector band indexes
  * ([[Dedup.writeSignatureIndex]], [[Similarity.writeVectorBandIndex]]).
  *
  * The grow-index micro-batch bodies append ONE parquet file per batch —
  * the right write shape (no read-modify-write of the standing index),
  * but a week of 1-minute batches is ~10k files, and at that point
  * listing + footer decode dominates the O(delta) band match the design
  * bought. The fix is the same one Delta/Iceberg's OPTIMIZE applies:
  * periodically rewrite the accumulated small files into
  * ceil(bytes / targetBytes) right-sized files — one repartition
  * exchange over the index, content-identical by construction.
  *
  * [[maybeCompact]] is the conf-gated hook the micro-batch bodies call
  * after their append: `spark.graft.index.compactEvery = N` (default 0 =
  * off; the scale profile sets 64) compacts whenever the part-file count
  * exceeds N, so steady-state file count is bounded by N while
  * compaction cost stays amortized (every N batches, not every batch).
  *
  * Swap protocol (local FS / HDFS rename semantics), designed so the
  * LIVE directory is never the target of an in-progress write and a
  * complete copy exists at every instant:
  *
  *  1. rewrite live → `<path>__compact_tmp` (live untouched);
  *  2. copy sidecars (the `_lsh_geometry` stamp) INTO tmp — the
  *     swapped-in dir must be complete before it goes live;
  *  3. rename live → `<path>__compact_old`, rename tmp → live
  *     (restoring old on a failed second rename);
  *  4. delete old.
  *
  * Crash recovery runs at the START of every compact call: a missing
  * live dir with `__compact_old` present (crash between the two swap
  * renames) renames old back; leftover tmp (crash mid-rewrite) and
  * leftover old (crash before the final delete) are safe to drop —
  * in both cases live is complete. Callers that hold DataFrames over
  * the index across a compaction must have materialized them (the
  * grow-index bodies do: results are eagerly lineage-truncated before
  * the append/compact step).
  */
object IndexMaintenance {

  /** part-file count of a parquet directory — the compaction trigger. */
  def partFileCount(s: SparkSession, path: String): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(_.getPath.getName.startsWith("part-"))
  }

  /** Conf-gated compaction: when `spark.graft.index.compactEvery` > 0
    * and the index holds more part files than that, rewrite it into
    * ceil(bytes / `spark.graft.index.compactTargetBytes`) files. */
  def maybeCompact(s: SparkSession, path: String): Unit = {
    val every = graft.GraftConf.int(s, "spark.graft.index.compactEvery", 0)
    if (every > 0 && partFileCount(s, path) > every)
      compact(s, path,
        graft.GraftConf.long(s, "spark.graft.index.compactTargetBytes",
          128L * 1024 * 1024))
  }

  /** Rewrite the parquet index at `path` into ceil(bytes/targetBytes)
    * files (at least one). Content-identical; sidecar files (underscore-
    * prefixed, e.g. the geometry stamp) are preserved. */
  def compact(s: SparkSession, path: String, targetBytes: Long): Unit = {
    require(targetBytes > 0, "spark.graft.index.compactTargetBytes must be positive")
    val live = new Path(path)
    val fs = live.getFileSystem(s.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + "__compact_tmp")
    val old = new Path(path + "__compact_old")
    // ---- crash recovery from a previous interrupted compaction ----
    if (!fs.exists(live) && fs.exists(old)) {
      // died between the two swap renames: old IS the index — restore it
      if (!fs.rename(old, live))
        throw new IllegalStateException(s"compaction recovery could not restore $path")
    }
    if (fs.exists(tmp)) fs.delete(tmp, true) // partial rewrite; live is complete
    if (fs.exists(old)) fs.delete(old, true) // completed swap; live is complete
    if (!fs.exists(live)) return
    val parts = fs.listStatus(live).filter(_.getPath.getName.startsWith("part-"))
    if (parts.isEmpty) return
    val bytes = parts.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // rewrite INTO tmp — the live index is never a write target
    s.read.parquet(live.toString).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    // sidecars (the _lsh_geometry stamp) go into tmp BEFORE the swap, so
    // the directory that goes live is complete — a stamp-less window
    // would silently disable the geometry-mismatch check
    fs.listStatus(live)
      .filter(f => f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("_SUCCESS"))
      .foreach { f =>
        val in = fs.open(f.getPath)
        val out = fs.create(new Path(tmp, f.getPath.getName), true)
        try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
        finally { in.close(); out.close() }
      }
    if (!fs.rename(live, old))
      throw new IllegalStateException(s"compaction could not stage $path")
    if (!fs.rename(tmp, live)) {
      fs.rename(old, live) // restore — the rewrite is abandoned, not the index
      throw new IllegalStateException(s"compaction could not swap in $path")
    }
    fs.delete(old, true)
  }
}
