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

  /** Small-file COMPACTION — the maintenance pass every long-lived table
    * needs: streaming ingest and fine-grained partitioned writes leave
    * thousands of tiny files, and at 100 TB the manifest pressure and
    * per-file open/footer cost dominate scans long before the bytes do.
    * This op fragments a copy of `documents` into 64 splats, measures
    * the actual on-disk bytes, rewrites into `ceil(bytes / targetBytes)`
    * files, and returns per-source content aggregates FROM THE COMPACTED
    * TABLE — so the oracle (which computes the same aggregates from the
    * original) gates that compaction moved bytes without changing one
    * row. File-count/size assertions live in LayoutSpec (not
    * SQL-expressible).
    *
    * Scale shape: compaction is one repartition exchange sized by
    * measured bytes (what OPTIMIZE/rewriteDataFiles does in Delta/
    * Iceberg); the verification aggregate is partial-agg over |sources|
    * groups. */
  def compactFiles(s: SparkSession, d: String): DataFrame = {
    val target = graft.GraftConf.long(s,
      "spark.graft.layout.compactTargetBytes", 4L * 1024 * 1024)
    require(target > 0, "compactTargetBytes must be positive")
    // session-reused staging root (deleted at JVM exit): both subdir
    // writes below are mode("overwrite") — Spark deletes the target dir
    // first — so re-entry refreshes content in place instead of
    // accumulating a full corpus copy per bench rep; the session-scoped
    // key keeps two drivers on the same dataset in disjoint roots — see
    // graft.TempDirs.scratchFor
    val base = graft.TempDirs.scratchFor("graft_compact_",
      graft.TempDirs.sessionKey(s, d))
    lastCompactBase = base
    val frag = new org.apache.hadoop.fs.Path(base.resolve("frag").toString)
    val tight = new org.apache.hadoop.fs.Path(base.resolve("compact").toString)
    documents(s, d).repartition(64)
      .write.mode("overwrite").parquet(frag.toString)
    val fs = frag.getFileSystem(s.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(frag)
      .filter(f => f.getPath.getName.startsWith("part-")).map(_.getLen).sum
    val nOut = math.max(1L, (bytes + target - 1) / target).toInt
    s.read.parquet(frag.toString).repartition(nOut)
      .write.mode("overwrite").parquet(tight.toString)
    s.read.parquet(tight.toString)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("tok_sum"),
        min(md5(col("text"))).as("min_md5"),
        max(md5(col("text"))).as("max_md5"))
      .orderBy(col("source"))
  }

  /** Staging root of the most recent [[compactFiles]] invocation in this
    * JVM — the spec's probe handle now that staging dirs are unique. */
  @volatile private[graft] var lastCompactBase: java.nio.file.Path = _

  /** Physical file count under the LAST compaction's stage dir —
    * LayoutSpec's probe for the before/after assertion. */
  private[graft] def partFileCount(s: SparkSession, d: String, sub: String): Int = {
    val p = new org.apache.hadoop.fs.Path(lastCompactBase.resolve(sub).toString)
    p.getFileSystem(s.sparkContext.hadoopConfiguration)
      .listStatus(p).count(f => f.getPath.getName.startsWith("part-"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder_layout" -> (zorderLayout _),
    "q_compact_files" -> (compactFiles _))

  val oracle: Map[String, String] = Map(
    // content preservation: the same aggregates over the ORIGINAL table —
    // any row compaction lost, duplicated, or mutated flips a column
    "q_compact_files" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tok_sum,
        |  MIN(md5(text)) AS min_md5, MAX(md5(text)) AS max_md5
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

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
