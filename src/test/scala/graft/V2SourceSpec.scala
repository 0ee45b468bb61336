package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.functions._

import graft.sources.{BucketV2, GraftBucketFormat, GraftBucketScan}

/** The graft-bucket DataSourceV2 connector: storage-partitioned join
  * (KeyGroupedPartitioning via HasPartitionKey — no exchange), reported
  * per-partition order (no sort), column pruning, and predicate pushdown
  * evaluated inside the reader. */
class V2SourceSpec extends SparkFunSuite {

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(nodes)
  }

  test("round trip preserves every supported type incl. escapes and nulls") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some("plain"), Some(1.5), Some(7), Some(true)),
      (2L, Some("tab\there nl\nthere \\N not null"), Some(-0.0), Some(-7), Some(false)),
      (3L, None: Option[String], None: Option[Double], None: Option[Int], None: Option[Boolean]),
      (18L, Some("\\trailing backslash\\"), Some(Double.MaxValue), Some(0), Some(true))
    ).toDF("k", "s", "d", "i", "b")
      .withColumn("dt", when($"k" =!= 3, to_date(lit("2024-02-29"))))
    val path = java.nio.file.Files.createTempDirectory("graft_v2_rt").toString
    GraftBucketFormat.write(df, path, "k", 4)
    val back = s.read.format("graft-bucket").load(path)
    assert(back.schema === df.schema)
    val exp = df.collect().map(_.toString).sorted.toSeq
    val got = back.collect().map(_.toString).sorted.toSeq
    assert(got === exp)
  }

  test("co-bucketed join is storage-partitioned: no exchange, no sort") {
    val df = BucketV2.v2BucketJoin(spark, sf)
    val qe = df.queryExecution
    qe.toRdd.count() // execute THIS instance so AQE finalizes its plan
    val all = nodes(qe.executedPlan)
    val smj = all.collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"expected a sort-merge join:\n${qe.executedPlan}")
    // below the join: the scans feed it directly — nothing reshuffles or
    // re-sorts what the connector already reported
    val below = nodes(smj.head)
    assert(!below.exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"storage-partitioned join still shuffled:\n${smj.head}")
    assert(!below.exists(_.isInstanceOf[SortExec]),
      s"reported ordering was ignored (Sort below the join):\n${smj.head}")
    // and the scans really are the V2 connector
    assert(below.count {
      case b: BatchScanExec => b.scan.isInstanceOf[GraftBucketScan]
      case _ => false
    } === 2)
  }

  test("join result matches the plain parquet join") {
    val s = spark
    val v2 = BucketV2.v2BucketJoin(s, sf).collect().map(_.toString).toSeq
    val pq = Tables.lineitem(s, sf)
      .join(Tables.orders(s, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(graft.Exact.dec(col("l_extendedprice"), 12, 2) *
          (lit(1).cast(org.apache.spark.sql.types.DecimalType(3, 2)) -
            graft.Exact.dec(col("l_discount"), 3, 2)))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderstatus"))
      .collect().map(_.toString).toSeq
    assert(v2 === pq)
  }

  test("column pruning and filter pushdown reach the reader") {
    val df = BucketV2.v2ScanPushdown(spark, sf)
    val scans = nodes(df.queryExecution.executedPlan)
      .collect { case b: BatchScanExec => b.scan.asInstanceOf[GraftBucketScan] }
    assert(scans.size === 1)
    val scan = scans.head
    // 2 of 5 columns survive pruning
    assert(scan.readSchema().fieldNames.toSeq === Seq("o_orderkey", "o_totalprice"))
    // both comparisons (and the implied IsNotNulls) were accepted by the
    // reader — accepted filters leave the plan entirely and are NOT
    // re-checked above the scan, so the reader's evaluation is the
    // correctness path here
    val pushed = scan.description()
    assert(pushed.contains("o_totalprice"), pushed)
    assert(pushed.contains("o_orderstatus"), pushed)
    // and the filter actually filters: every surviving row qualifies
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(1) > 450000.0))
  }

  test("writes one sorted file per bucket, empty buckets included") {
    val s = spark
    import s.implicits._
    // keys chosen so buckets 1 and 3 are empty
    val df = Seq(0L, 4L, 8L, 2L, 6L, 10L, 14L).toDF("k")
      .withColumn("v", ($"k" * 10).cast("long"))
    val path = java.nio.file.Files.createTempDirectory("graft_v2_files").toString
    GraftBucketFormat.write(df, path, "k", 4)
    (0 until 4).foreach { b =>
      val f = new java.io.File(GraftBucketFormat.bucketFile(path, b))
      assert(f.exists(), s"bucket $b file missing")
    }
    assert(java.nio.file.Files.size(java.nio.file.Paths.get(
      GraftBucketFormat.bucketFile(path, 1))) === 0L)
    // within-bucket key order is ascending (the ordering the scan reports)
    val lines = scala.io.Source.fromFile(
      GraftBucketFormat.bucketFile(path, 2)).getLines().toSeq
    val keys = lines.map(_.split('\t')(0).toLong)
    assert(keys === keys.sorted)
    assert(keys.forall(k => GraftBucketFormat.bucketOf(k, 4) == 2))
  }

  test("empty strings survive the TSV codec, trailing field included") {
    val s = spark
    import s.implicits._
    // "" in first/middle/last position — a split without limit -1 would
    // drop the trailing empty and shift/underflow the decode
    val df = Seq(
      (1L, "", "mid", ""),
      (2L, "a", "", "c"),
      (3L, "", "", "")
    ).toDF("k", "s1", "s2", "s3")
    val path = java.nio.file.Files.createTempDirectory("graft_v2_empty").toString
    GraftBucketFormat.write(df, path, "k", 2)
    val back = s.read.format("graft-bucket").load(path)
    assert(back.count() === 3) // no row silently dropped
    val got = back.collect().map(_.toString).sorted.toSeq
    assert(got === df.collect().map(_.toString).sorted.toSeq)
  }

  test("accepted double filter matches -0.0 = 0.0 like Spark SQL") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, -0.0), (2L, 0.0), (3L, 1.5)).toDF("k", "d")
    val path = java.nio.file.Files.createTempDirectory("graft_v2_zero").toString
    GraftBucketFormat.write(df, path, "k", 2)
    val back = s.read.format("graft-bucket").load(path).filter($"d" === 0.0)
    // EqualTo(d, 0.0) is accepted by the reader (never re-checked): the
    // stored -0.0 row must come back, as it would from parquet
    assert(back.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("Hadoop storage: file:// URI round-trips through the same connector") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (2L, "b\twith tab"), (5L, null.asInstanceOf[String]))
      .toDF("k", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_v2_hdfs").toString
    val uri = s"file://$dir/tbl" // resolves to Hadoop LocalFileSystem
    GraftBucketFormat.write(df, uri, "k", 2)
    assert(sources.BucketStorages.forPath(uri) eq sources.HadoopBucketStorage)
    val back = s.read.format("graft-bucket").load(uri)
    assert(back.collect().map(_.toString).sorted.toSeq ===
      df.collect().map(_.toString).sorted.toSeq)
  }

  test("corrupt bucket file fails loudly, never returns shifted rows") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "v", "d")
    val path = java.nio.file.Files.createTempDirectory("graft_v2_corrupt").toString
    GraftBucketFormat.write(df, path, "k", 2)
    // chop a field off one row: decode must refuse, not misalign
    val f = java.nio.file.Paths.get(GraftBucketFormat.bucketFile(path, 1))
    val lines = java.nio.file.Files.readAllLines(f)
    java.nio.file.Files.write(f,
      java.util.List.of(lines.get(0).split("\t", -1).dropRight(1).mkString("\t")))
    val e = intercept[Exception] {
      s.read.format("graft-bucket").load(path).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("fields") || m.contains("schema")),
      s"expected the field-count guard, got: ${messages(e).mkString(" | ")}")
  }

  test("v2BucketJoin leaks no confs into the caller's session") {
    val s = spark
    val watched = Seq(
      "spark.sql.catalog.graft_v2",
      "spark.sql.catalog.graft_v2.warehouse",
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.sorting.enabled")
    def snapshot() = watched.map(k => k -> s.conf.getOption(k))
    val before = snapshot()
    BucketV2.v2BucketJoin(s, sf).collect()
    assert(snapshot() === before,
      "v2BucketJoin mutated the caller session's confs")
  }
}
