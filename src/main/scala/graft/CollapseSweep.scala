package graft

import org.apache.spark.sql.functions._

/** Diagnostic main: pins `spark.graft.dedup.collapseMinDupFrac` to
  * evidence instead of assertion. The adaptive exact-collapse skips the
  * pre-collapse machinery when the probed exact-duplicate share is
  * below the threshold (default 1%); this sweep measures the cluster
  * pipeline's wall clock at several thresholds on a given corpus and
  * reports which route each threshold took, so the NOTES table can show
  * the default sits in a flat region on BOTH corpus shapes (dup-free:
  * every threshold > share skips, identical cost; dup-heavy: every
  * threshold < share engages and keeps the collapse win — only a
  * threshold straddling the corpus' actual share changes anything).
  *
  * Usage: runMain graft.CollapseSweep <corpusDir> [plant=N] [thr ...]
  * (thresholds default to 0.5%/1%/5%; SPARK_GRAFT_REPS reps, median.)
  * `plant=N` first appends N exact copies of one paragraph (ids from
  * 2·10¹², above every ScaleSmoke range) — the seam for the
  * INFORMATIVE middle fixture whose dup share falls BETWEEN the swept
  * thresholds, so the sweep actually exercises both routes on one
  * corpus (the ×10 dup-free and hot fixtures sit entirely below/above
  * every threshold). Probe-only, never a catalog path — numbers land
  * in NOTES.md.
  */
object CollapseSweep {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val plant = args.drop(1).find(_.startsWith("plant="))
      .map(_.stripPrefix("plant=").toLong).getOrElse(0L)
    val rest = args.drop(1).filterNot(_.startsWith("plant="))
    val thresholds =
      if (rest.nonEmpty) rest.toSeq.map(_.toDouble)
      else Seq(0.005, 0.01, 0.05)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.profile", "scale") // the preset the dial lives in
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (plant > 0) {
      // idempotent: a re-run (more thresholds, bumped reps) must not
      // append the same doc_id range again — duplicate ids would break
      // the engine's id-uniqueness contract and silently double the
      // probed dup share the sweep reports against
      val already = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") >= 2000000000000L).limit(1).count() > 0
      if (already)
        System.err.println("[collapse-sweep] planted rows already present — skipping plant")
      else {
        val para = "probe duplicate paragraph for the collapse threshold " +
          "sweep measuring the adaptive skip dial on a mid-share corpus"
        spark.range(plant).select(
          (col("id") + 2000000000000L).as("doc_id"),
          lit(para).as("text"), lit("en").as("lang"), lit("src1").as("source"),
          lit(para.length.toLong).as("n_chars"))
          .write.mode("append").parquet(s"$dir/documents.parquet")
      }
    }
    // the corpus' actual exact-dup share, so each threshold's route is
    // interpretable (same md5 grouping the pipeline's probe uses)
    val st = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .agg(count(lit(1)).as("docs"),
        count_distinct(md5(col("text"))).as("groups")).collect()(0)
    val share =
      if (st.getLong(0) == 0L) 0.0
      else (st.getLong(0) - st.getLong(1)).toDouble / st.getLong(0)
    println(f"CORPUS $dir docs=${st.getLong(0)}%d dup_share=$share%.4f")
    val q = Seq("q_dedup_clusters" -> SparkEntry.queries("q_dedup_clusters"))
    for (thr <- thresholds) {
      spark.conf.set("spark.graft.dedup.collapseMinDupFrac", thr.toString)
      try {
        val e0 = operators.Dedup.collapseEngaged.get()
        val s0 = operators.Dedup.collapseSkipped.get()
        val (times, fails) = Bench.measure(spark, dir, reps, q)
        val route =
          if (operators.Dedup.collapseEngaged.get() > e0) "engaged"
          else if (operators.Dedup.collapseSkipped.get() > s0) "skipped"
          else "none"
        val sec = times.toMap.get("q_dedup_clusters")
          .map(v => f"$v%.2f").getOrElse("null")
        println(s"SWEEP thr=$thr median_sec=$sec route=$route " +
          s"reps=$reps fails=${fails.size}")
      } finally spark.conf.unset("spark.graft.dedup.collapseMinDupFrac")
    }
    spark.stop()
  }
}
