package graft

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.ZOrder
import graft.operators.Layout

class LayoutSpec extends SparkFunSuite {

  test("morton key matches a bit-by-bit reference, edges included") {
    def reference(x: Int, y: Int): Long =
      (0 until 16).map { i =>
        (((x.toLong >> i) & 1L) << (2 * i)) | (((y.toLong >> i) & 1L) << (2 * i + 1))
      }.sum
    val rng = new scala.util.Random(42)
    val cases = Seq((0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2)) ++
      Seq.fill(200)((rng.nextInt(65536), rng.nextInt(65536)))
    for ((x, y) <- cases)
      assert((ZOrder.spread16(x) | (ZOrder.spread16(y) << 1)) === reference(x, y),
        s"mismatch at ($x, $y)")
    // and through the SQL surface (exercises eval + codegen paths)
    ZOrder.register(spark)
    val viaSql = spark.createDataFrame(cases.map { case (x, y) => (x, y) })
      .toDF("x", "y")
      .selectExpr("x", "y", "graft_zorder(x, y) AS z").collect()
    for (r <- viaSql)
      assert(r.getLong(2) === reference(r.getInt(0), r.getInt(1)))
  }

  test("zorder expression stays inside whole-stage codegen") {
    val df = Layout.zorderLayout(spark, sf)
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    df.queryExecution.toRdd.count()
    val all = nodes(df.queryExecution.executedPlan)
    val codegenSpans = all.collect { case w: WholeStageCodegenExec => w }
    assert(codegenSpans.nonEmpty)
    // the projection computing zkey must be INSIDE a codegen span, i.e.
    // no node anywhere prints the expression outside WholeStageCodegen
    val outside = all.filter(p => !p.isInstanceOf[WholeStageCodegenExec] &&
      p.toString.linesIterator.next().contains("graft_zorder") &&
      !all.exists(w => w.isInstanceOf[WholeStageCodegenExec] &&
        nodes(w).exists(_ eq p)))
    assert(outside.isEmpty, s"zorder evaluated outside codegen:\n$outside")
  }

  test("z-ranges are tight rectangles in BOTH dimensions") {
    val stats = Layout.zorderLayout(spark, sf).collect()
    assert(stats.length > 4, "expected multiple z-ranges")
    val avgXSide = stats.map(r => r.getInt(3) - r.getInt(2) + 1).sum.toDouble / stats.length
    val avgYSide = stats.map(r => r.getInt(5) - r.getInt(4) + 1).sum.toDouble / stats.length
    // 1024 z-keys per range cover a ~32×32 tile of the 256×256 domain;
    // real data is sparse in z-space so tiles can merge, but the average
    // side must stay a small fraction of the 256-wide domain in BOTH
    // dimensions (a single-column sort would pin one side near 256)
    assert(avgXSide <= 96.0, f"x side $avgXSide%.1f — not clustered")
    assert(avgYSide <= 96.0, f"y side $avgYSide%.1f — not clustered")
  }

  test("executed proof: z-layout lets row-group pruning skip what a 1-D sort cannot") {
    // same rows, two physical layouts, one 2-D box predicate — the scan
    // metric counts rows the parquet reader actually surfaced after
    // min/max pruning, i.e. the IO the layout failed to skip
    val dir = java.nio.file.Files.createTempDirectory("graft_zprune").toString
    Layout.writeBox2d(spark, sf, s"$dir/z", zOrdered = true)
    Layout.writeBox2d(spark, sf, s"$dir/x1d", zOrdered = false)
    val (zScan, zMatch) = Layout.boxScanRows(spark, s"$dir/z", 64, 95, 64, 95)
    val (xScan, xMatch) = Layout.boxScanRows(spark, s"$dir/x1d", 64, 95, 64, 95)
    assert(zMatch === xMatch, "layouts disagree on the query RESULT")
    assert(zMatch > 0, "empty box — predicate proves nothing")
    info(f"32×32 box: matched=$zMatch, scanned z=$zScan vs 1-D=$xScan " +
      f"(${xScan.toDouble / zScan}%.1fx fewer rows surfaced)")
    assert(zScan < xScan,
      s"z-layout surfaced $zScan rows, not fewer than the 1-D layout's $xScan")
    assert(zScan.toDouble <= xScan.toDouble / 2,
      s"z-layout pruning not meaningfully better: $zScan vs $xScan")
  }

  test("compaction collapses the 64-file fragmentation to the byte-targeted count") {
    val out = Layout.compactFiles(spark, sf).collect()
    // content preserved (the oracle gates values; here the shape)
    assert(out.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf).count())
    val fragFiles = Layout.partFileCount(spark, sf, "frag")
    val tightFiles = Layout.partFileCount(spark, sf, "compact")
    info(s"compaction: $fragFiles files -> $tightFiles")
    assert(fragFiles === 64, s"fragmentation stage wrote $fragFiles files")
    assert(tightFiles >= 1 && tightFiles < fragFiles / 4,
      s"compaction left $tightFiles files from $fragFiles")
  }
}
