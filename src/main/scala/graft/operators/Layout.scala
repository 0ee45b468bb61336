package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: how rows are ARRANGED into files decides what
  * a 100 TB scan can skip. The engine's write surface already covers
  * partitioning and bucketing (partitioned sink, graft-bucket SPJ
  * tables); this module adds multi-dimensional clustering.
  */
object Layout {

  /** Z-order layout audit: key every row by the Morton interleave of two
    * dimensions ([[graft.functions.ZOrder2]]), cut the z-curve into
    * fixed-width ranges (stand-ins for output files), and report each
    * range's min/max per dimension — exactly the column stats a reader
    * would prune on. The z-curve property this output exhibits: every
    * range is a tight rectangle in BOTH dimensions (LayoutSpec asserts
    * the average side is a small fraction of the domain), so a 2-D
    * predicate eliminates most ranges; a single-column sort would leave
    * the second dimension's min/max spanning the whole domain in every
    * file.
    *
    * Scale shape: the key is a per-row codegen'd expression on the scan;
    * the per-range stats are one partial-agg exchange over |ranges|
    * groups. Writing the layout is `df.repartitionByRange(zkey)
    * .sortWithinPartitions(zkey)` on the same key — no extra machinery. */
  def zorderLayout(s: SparkSession, d: String): DataFrame = {
    graft.functions.ZOrder.register(s)
    orders(s, d)
      .select(
        (col("o_orderkey") % 256).cast("int").as("x"),
        (col("o_custkey") % 256).cast("int").as("y"))
      .withColumn("zkey", expr("graft_zorder(x, y)"))
      .withColumn("z_range", (col("zkey") / 1024L).cast("long"))
      .groupBy(col("z_range"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .orderBy(col("z_range"))
  }

  /** Write the orders 2-D projection to parquet under one of two physical
    * layouts over the SAME rows: z-ordered (`repartitionByRange` on the
    * Morton key + `sortWithinPartitions` — exactly the write recipe
    * [[zorderLayout]]'s doc promises) or sorted by `x` alone (the 1-D
    * baseline every single-column clustering gives you). The layout key
    * is dropped before writing — the reader prunes on the parquet
    * row-group min/max of the REAL columns, which is the point. */
  def writeBox2d(s: SparkSession, d: String, path: String,
      zOrdered: Boolean, files: Int = 64): Unit = {
    graft.functions.ZOrder.register(s)
    val keyed = orders(s, d)
      .select(
        (col("o_orderkey") % 256).cast("int").as("x"),
        (col("o_custkey") % 256).cast("int").as("y"),
        col("o_totalprice").as("payload"))
      .withColumn("zkey", expr("graft_zorder(x, y)"))
    val arranged =
      if (zOrdered)
        keyed.repartitionByRange(files, col("zkey")).sortWithinPartitions(col("zkey"))
      else
        keyed.repartitionByRange(files, col("x")).sortWithinPartitions(col("x"))
    arranged.drop("zkey").write.mode("overwrite").parquet(path)
  }

  /** Execute a 2-D box predicate over a [[writeBox2d]] table and report
    * (rows the parquet scan actually surfaced, rows matching the
    * predicate). The first number is what min/max row-group pruning
    * could NOT skip — the executed measurement behind the z-curve claim:
    * under a 2-D box, the z-layout's scan count collapses toward the
    * match count while a 1-D sort must surface every row group whose `x`
    * range overlaps, because its `y` min/max spans the whole domain. */
  def boxScanRows(s: SparkSession, path: String,
      x0: Int, x1: Int, y0: Int, y1: Int): (Long, Long) = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = s.read.parquet(path)
      .filter(col("x").between(x0, x1) && col("y").between(y0, y1))
    val matched = df.queryExecution.toRdd.count() // executes THIS instance
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    val scanned = nodes(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f.metrics("numOutputRows").value }
      .sum
    (scanned, matched)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder_layout" -> (zorderLayout _))

  val oracle: Map[String, String] = Map(
    // the Morton key replayed bit-by-bit: sum over i of the x bit at
    // even position 2i and the y bit at odd position 2i+1
    "q_zorder_layout" ->
      """WITH t AS (
        |  SELECT CAST(o_orderkey % 256 AS INT) AS x,
        |         CAST(o_custkey % 256 AS INT) AS y
        |  FROM orders),
        |z AS (
        |  SELECT x, y,
        |    CAST(list_sum(list_transform(range(0, 16), i ->
        |      (((CAST(x AS BIGINT) >> i) & 1) << (2 * i)) +
        |      (((CAST(y AS BIGINT) >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS zkey
        |  FROM t)
        |SELECT zkey // 1024 AS z_range, COUNT(*) AS n_rows,
        |  min(x) AS min_x, max(x) AS max_x,
        |  min(y) AS min_y, max(y) AS max_y
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin)
}
