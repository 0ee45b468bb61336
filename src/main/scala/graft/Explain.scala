package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for selected queries so
  * scan pushdown (PushedFilters/ReadSchema), join strategy (broadcast vs
  * shuffle), TakeOrderedAndProject, and whole-stage-codegen spans can be
  * inspected. Usage: runMain graft.Explain [queryName ...] (default: a
  * representative set).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_filter_pred", "q_join_broadcast", "q3_shipping", "q_topk",
      "q1_agg", "q_dedup_minhash", "q_knn_brute", "q_events_tumbling")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
