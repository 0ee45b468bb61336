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
  * Swap protocol (local FS / HDFS rename semantics): the live directory
  * is renamed to `<path>__compacting`, rewritten into a fresh `<path>`,
  * sidecars (the `_lsh_geometry` stamp) copied over, and the old
  * directory deleted. A crash mid-rewrite leaves `<path>__compacting`
  * complete and untouched — recovery is renaming it back. Callers that
  * hold DataFrames over the index across a compaction must have
  * materialized them (the grow-index bodies do: results are eagerly
  * lineage-truncated before the append/compact step).
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
    if (!fs.exists(live)) return
    val stage = new Path(path + "__compacting")
    if (fs.exists(stage)) fs.delete(stage, true) // stale crash leftover
    val parts = fs.listStatus(live).filter(_.getPath.getName.startsWith("part-"))
    if (parts.isEmpty) return
    val bytes = parts.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    if (!fs.rename(live, stage))
      throw new IllegalStateException(s"compaction could not stage $path")
    s.read.parquet(stage.toString).repartition(nOut)
      .write.mode("overwrite").parquet(path)
    // carry sidecars (the _lsh_geometry stamp) into the rewritten dir
    fs.listStatus(stage)
      .filter(f => f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("_SUCCESS"))
      .foreach { f =>
        val in = fs.open(f.getPath)
        val out = fs.create(new Path(live, f.getPath.getName), true)
        try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
        finally { in.close(); out.close() }
      }
    fs.delete(stage, true)
  }
}
