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
  *      SPARK_GRAFT_SHUFFLE_PARTITIONS (cpus), SPARK_GRAFT_PROFILE.
  * Output: one ORDERPROBE line per dir with every rep's seconds and
  * steal, in execution order. */
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
    dirs.zipWithIndex.foreach { case (d, i) =>
      val (t, fails) = Bench.measureDetailed(spark, d, reps, Seq(name -> fn))
      val line = t.headOption.map { case (_, rs) =>
        rs.map(r => f"${r.totalSec}%.1f(st${r.stealSec}%.1f)").mkString(" ")
      }.getOrElse(s"FAILED: ${fails.mkString(",")}")
      println(s"ORDERPROBE ${i + 1}/${dirs.length} $name $d reps: $line")
    }
    spark.stop()
  }
}
