package graft

import org.apache.spark.sql.SparkSession

/** Session-order adjudicator (measurement main, no oracle): measures ONE
  * catalog query at reps=3 medians across a SEQUENCE of corpus dirs
  * inside a single warm JVM/session — the tool for separating "this
  * corpus is slower" from "this measurement ran colder" when two
  * corpora are compared within one session (the fleet pass's shape).
  * A dir may repeat: `OrderProbe q_x base scaled base` is the A/B/A
  * read — if the late base re-measure lands well under the early one,
  * the early number carried session warm-up, not corpus cost.
  *
  * Usage: runMain graft.OrderProbe <query> <dir> [<dir> ...]
  * Env: SPARK_GRAFT_CPUS (32), SPARK_GRAFT_REPS (3),
  *      SPARK_GRAFT_SHUFFLE_PARTITIONS (cpus), SPARK_GRAFT_PROFILE;
  *      SPARK_GRAFT_STAGE_BYTES=1 additionally prints, per dir, the
  *      top stages by shuffle-write bytes aggregated by stage callsite
  *      (summed across reps) — the attribution layer under the smoke's
  *      per-query shuffle_profile totals (WHICH exchange carries the
  *      bytes, named by "<op> at <File.scala:line>").
  * Output: one ORDERPROBE line per dir with every rep's seconds and
  * steal, in execution order (plus STAGEBYTES lines in that mode). */
object OrderProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OrderProbe <query> <dir> [<dir> ...]")
    val name = args(0)
    val dirs = args.drop(1)
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown catalog query: $name"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.quietGlobalWindowWarnings()
    sys.env.get("SPARK_GRAFT_PROFILE").foreach(p =>
      spark.conf.set(GraftConf.ProfileKey, p))
    GraftConf.requireKnown(spark)
    val stats =
      if (sys.env.get("SPARK_GRAFT_STAGE_BYTES").contains("1"))
        Some(ShuffleStats.installPerStage(spark.sparkContext))
      else None
    dirs.zipWithIndex.foreach { case (d, i) =>
      val (t, fails) = Bench.measureDetailed(spark, d, reps, Seq(name -> fn))
      val line = t.headOption.map { case (_, rs) =>
        rs.map(r => f"${r.totalSec}%.1f(st${r.stealSec}%.1f)").mkString(" ")
      }.getOrElse(s"FAILED: ${fails.mkString(",")}")
      println(s"ORDERPROBE ${i + 1}/${dirs.length} $name $d reps: $line")
      stats.foreach { st =>
        Thread.sleep(2000) // listener bus settle, the smoke's margin
        val rows = st.drainStages()
        // callsite aggregation first — self-attributing for plans whose
        // stages keep user callsites. CAVEAT (measured): AQE-materialized
        // stages all inherit the AQE thread pool's callsite
        // ("withThreadLocalCaptured at CompletableFuture.java"), so for
        // AQE plans the per-STAGE listing below is the readable layer —
        // it shows whether the bytes are one fat exchange or many small
        // ones, which is the sizing-relevant fact.
        rows.groupBy(_.name)
          .map { case (n, rs) => (n, rs.map(_.shuffleWriteBytes).sum, rs.length) }
          .toSeq.sortBy(-_._2).filter(_._2 > 0).take(8)
          .foreach { case (n, sw, c) =>
            println(f"STAGEBYTES ${i + 1}/${dirs.length} $d sw=${sw / 1048576.0}%9.1f MiB stages=$c%3d  $n")
          }
        rows.sortBy(-_.shuffleWriteBytes).filter(_.shuffleWriteBytes > 0).take(12)
          .foreach { r =>
            println(f"STAGEBYTES ${i + 1}/${dirs.length} $d stage=${r.stageId}%4d " +
              f"sw=${r.shuffleWriteBytes / 1048576.0}%9.1f MiB " +
              f"in=${r.inputBytes / 1048576.0}%8.1f MiB sr=${r.shuffleReadBytes / 1048576.0}%8.1f MiB")
          }
      }
    }
    spark.stop()
  }
}
