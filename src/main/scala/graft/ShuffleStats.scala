package graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}

/** Per-query shuffle-byte accounting for the scale smoke — the
  * instrumentation behind the NOTES "input → shuffle expansion" table.
  *
  * Why it exists: `spark.graft.shuffle.targetBytesPerPartition` (the
  * 4 MiB/partition dial) was calibrated by A/B on ONE box; a deployment
  * on different hardware re-derives its own target from the measured
  * input-bytes → shuffle-bytes EXPANSION FACTOR of each heavy family —
  * this listener makes that factor a per-round artifact instead of a
  * hand-run estimate.
  *
  * Attribution rides the bench harness's own job groups:
  * [[Bench.measureDetailed]] wraps every rep in a unique
  * `graft-bench-<query>-<seq>` group set on the submitting thread, so
  * every job of the rep — eager build prelude included — lands in that
  * group. Jobs map stages to the group at `onJobStart`
  * (`spark.jobGroup.id` is in the job properties), stage-aggregated
  * task metrics accumulate at `onStageCompleted`. Skipped stages
  * (reused shuffle output) post no completion event and correctly add
  * nothing. Cost: two map updates per stage — free at smoke scale.
  *
  * Reads happen once per measured pass via [[drain]], which snapshots
  * and clears BOTH maps; the listener bus is asynchronous, so callers
  * drain AFTER a short settle (the smoke sleeps 2 s — stage events
  * trail the blocking action by milliseconds, the margin is
  * generosity). A straggler completion arriving after the drain is
  * DROPPED on purpose: its stage→group entry was cleared with the
  * snapshot, and crediting it to the next drain would misattribute one
  * pass's bytes to the other corpus — a small undercount beats a
  * cross-pass smear. */
final class ShuffleStats(perStage: Boolean = false) extends SparkListener {
  import ShuffleStats.{StageRow, Totals}

  private val stageGroup =
    scala.collection.concurrent.TrieMap.empty[Int, String]
  private val byGroup =
    scala.collection.concurrent.TrieMap.empty[String, Totals]
  // per-stage rows (perStage mode only): the attribution layer below
  // the per-query totals — which EXCHANGE carries the bytes, named by
  // the stage's callsite (e.g. "persist at Dedup.scala:228")
  private val stageRows =
    new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()

  override def onJobStart(j: SparkListenerJobStart): Unit = {
    val g = Option(j.properties)
      .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
    g.filter(_.startsWith("graft-bench-")).foreach { gr =>
      j.stageInfos.foreach(si => stageGroup.put(si.stageId, gr))
    }
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    val si = e.stageInfo
    for (g <- stageGroup.get(si.stageId); m <- Option(si.taskMetrics)) {
      val t = byGroup.getOrElseUpdate(g, new Totals)
      t.inputBytes.addAndGet(m.inputMetrics.bytesRead)
      t.shuffleWriteBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      t.shuffleReadBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      if (perStage)
        stageRows.add(StageRow(g, si.stageId, si.name,
          m.inputMetrics.bytesRead, m.shuffleWriteMetrics.bytesWritten,
          m.shuffleReadMetrics.totalBytesRead))
    }
  }

  /** Snapshot-and-clear the per-stage rows (perStage mode). Unlike
    * [[drain]] this keeps EVERY rep's stages — callers aggregate by
    * stage name (the callsite) to attribute a query's bytes to its
    * exchanges. */
  def drainStages(): Seq[StageRow] = {
    val out = Seq.newBuilder[StageRow]
    var r = stageRows.poll()
    while (r != null) { out += r; r = stageRows.poll() }
    out.result()
  }

  /** Snapshot-and-clear: per QUERY, the LAST completed rep's totals
    * (groups are `graft-bench-<query>-<seq>` with a monotonically
    * increasing seq; the last rep is the warm one — a deterministic
    * catalog query shuffles the same bytes every rep, so any rep would
    * do, and picking one keeps the number a per-rep fact rather than a
    * reps-dependent sum). */
  def drain(): Map[String, Totals] = {
    val snap = byGroup.readOnlySnapshot().toMap
    byGroup.clear()
    stageGroup.clear()
    val Group = """graft-bench-(.+)-(\d+)""".r
    snap.toSeq
      .collect { case (Group(name, seq), t) => (name, seq.toLong, t) }
      .groupBy(_._1)
      .map { case (name, reps) => name -> reps.maxBy(_._2)._3 }
  }
}

object ShuffleStats {
  final class Totals {
    val inputBytes = new java.util.concurrent.atomic.AtomicLong(0)
    val shuffleWriteBytes = new java.util.concurrent.atomic.AtomicLong(0)
    val shuffleReadBytes = new java.util.concurrent.atomic.AtomicLong(0)
  }

  /** One completed stage's bytes under a bench group. `name` is Spark's
    * stage name — the callsite string (`"<op> at <File.scala:line>"`)
    * that makes the row self-attributing. */
  final case class StageRow(group: String, stageId: Int, name: String,
      inputBytes: Long, shuffleWriteBytes: Long, shuffleReadBytes: Long)

  /** Install on the context; returns the instance to [[ShuffleStats.drain]]. */
  def install(sc: SparkContext): ShuffleStats = {
    val s = new ShuffleStats
    sc.addSparkListener(s)
    s
  }

  /** [[install]] with per-stage retention — [[ShuffleStats.drainStages]]
    * feeds the stage-level attribution read ([[graft.OrderProbe]]'s
    * SPARK_GRAFT_STAGE_BYTES mode). */
  def installPerStage(sc: SparkContext): ShuffleStats = {
    val s = new ShuffleStats(perStage = true)
    sc.addSparkListener(s)
    s
  }
}
