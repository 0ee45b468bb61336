package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** The persisted positional postings index
  * ([[Retrieval.writePostingsIndex]] + serve/grow): serving must be
  * bit-equal to the scan-side queries, must PRUNE bucket partitions to
  * the query terms' buckets, and growth must be replay-safe with
  * sidecars that stay consistent. */
class PostingsIndexSpec extends SparkFunSuite {

  private def descend(p: SparkPlan): Seq[SparkPlan] =
    p +: (p.children.flatMap(descend) ++ (p match {
      case a: AdaptiveSparkPlanExec => descend(a.executedPlan)
      case q: QueryStageExec        => descend(q.plan)
      case _                        => Nil
    }))

  test("posting_explode is bit-equal to the posexplode+groupBy formulation") {
    // the round-19 generator replaces the aggregation whose exchange
    // shipped one row per token POSITION (401 of 507 MiB at the x10
    // corpus) — this pins the replacement to the declarative form it
    // displaced, over the whole fixture corpus plus the edge shapes
    // (empty text -> one empty-string token; repeated tokens -> tf > 1
    // with ascending positions)
    graft.functions.PostingExplode.register(spark)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .unionByName(spark.createDataFrame(Seq(
        (900001L, ""), (900002L, "a b a c b a"))).toDF("doc_id", "text"))
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("token"), col("tf"),
        col("positions").cast("array<long>").as("positions"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getSeq[Long](3)))
      .sortBy(t => (t._1, t._2))
    val gen = canon(toks.select(col("doc_id"), expr("posting_explode(toks)")))
    val agg = canon(toks
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("i", "token")))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("i").cast("long"))).as("positions")))
    assert(gen.nonEmpty && gen.length === agg.length)
    assert(gen === agg)
    // the planted repeat doc: tf and position order are the aggregate's
    val rep = gen.filter(t => t._1 == 900002L && t._2 == "a").head
    assert(rep._3 === 3L && rep._4 === Seq(0L, 2L, 5L))
  }

  test("driver-side tokenBucket replicates the engine's md5 bucket expression") {
    val rows = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token")).distinct()
      .withColumn("b",
        (conv(substring(md5(col("token")), 1, 6), 16, 10).cast("long")
          % Retrieval.IndexBuckets).cast("int"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Retrieval.tokenBucket(r.getString(0)) === r.getInt(1),
        s"bucket mismatch for token '${r.getString(0)}'")
    }
  }

  test("indexed BM25 and phrase serving are bit-equal to the scan paths, both SFs") {
    for (d <- Seq(sf, "/root/testdata/sf0.01")) {
      val bmDirect = Retrieval.bm25TopK(spark, d).collect().map(_.toString).toSeq
      val phDirect = Retrieval.phraseSearch(spark, d).collect().map(_.toString).toSeq
      val path = TempDirs.scratch("graft_postspec_").resolve("idx").toString
      Retrieval.writePostingsIndex(spark, d, path)
      assert(Retrieval.bm25FromIndex(spark, path).collect().map(_.toString).toSeq
        === bmDirect, s"bm25 at $d")
      assert(Retrieval.phraseFromIndex(spark, path).collect().map(_.toString).toSeq
        === phDirect, s"phrase at $d")
    }
  }

  test("indexed batch retrieval is bit-equal to the scan-side bm25Batch, both SFs") {
    for (d <- Seq(sf, "/root/testdata/sf0.01")) {
      val direct = Retrieval.bm25Batch(spark, d).collect().map(_.toString).toSeq
      val served = Retrieval.bm25BatchIndexed(spark, d).collect().map(_.toString).toSeq
      assert(served === direct, s"at $d")
    }
  }

  test("serving prunes the scan to the query terms' bucket directories") {
    val path = TempDirs.scratch("graft_postspec2_").resolve("idx").toString
    Retrieval.writePostingsIndex(spark, sf, path)
    val served = Retrieval.bm25FromIndex(spark, path)
    served.collect()
    val scans = descend(served.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("graft_postspec2_"))
            && f.schema.fieldNames.contains("tf") => f
    }
    assert(scans.nonEmpty, "no postings scan found:\n" +
      served.queryExecution.executedPlan.toString.take(3000))
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "term buckets must land on the partition column")
    val expected = Seq("spark", "query", "window")
      .map(Retrieval.tokenBucket).distinct.size
    val prunedDirs = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.values.toString).distinct
    assert(prunedDirs.size <= expected,
      s"expected <= $expected bucket dirs, scan reads ${prunedDirs.size}")
    val allBuckets = spark.read.parquet(path).select(col("bucket")).distinct().count()
    assert(allBuckets > expected, s"fixture degenerate: only $allBuckets buckets")
  }

  test("BM25 serving never reads the positions column") {
    val path = TempDirs.scratch("graft_postspec3_").resolve("idx").toString
    Retrieval.writePostingsIndex(spark, sf, path)
    val served = Retrieval.bm25FromIndex(spark, path)
    served.collect()
    val scans = descend(served.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("graft_postspec3_"))
            && f.schema.fieldNames.contains("tf") => f
    }
    assert(scans.nonEmpty)
    assert(!scans.exists(_.schema.fieldNames.contains("positions")),
      "ranked serving must column-prune the position lists")
  }

  test("sidecars are invisible to a plain read; meta matches the corpus") {
    val path = TempDirs.scratch("graft_postspec4_").resolve("idx").toString
    Retrieval.writePostingsIndex(spark, sf, path)
    val cols = spark.read.parquet(path).columns.toSet
    assert(cols === Set("token", "doc_id", "dl", "tf", "positions", "bucket"))
    val meta = spark.read.parquet(path + "/_postings_meta").collect()(0)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"))
    assert(meta.getAs[Long]("n_d") === docs.count())
    assert(meta.getAs[Long]("a_l") ===
      docs.agg(sum(col("dl"))).collect()(0).getLong(0))
  }

  test("growth: partial index + append serves like a full build; replay is a no-op") {
    val full = TempDirs.scratch("graft_postspec5_").resolve("idx").toString
    Retrieval.writePostingsIndex(spark, sf, full)
    val fullBm = Retrieval.bm25FromIndex(spark, full).collect().map(_.toString).toSeq
    val fullPh = Retrieval.phraseFromIndex(spark, full).collect().map(_.toString).toSeq

    val seedPath = TempDirs.scratch("graft_postspec6_").resolve("idx").toString
    val docs = Tables.documents(spark, sf)
    // seed with the first 400 docs, grow with the rest — the append
    // batch deliberately overlaps 50 already-indexed docs (350..399),
    // which the replay-safety anti-join must drop
    docsSubsetWrite(seedPath, docs.filter(col("doc_id") < 400))
    Retrieval.appendToPostingsIndex(
      docs.filter(col("doc_id") >= 350).select(col("doc_id"), col("text")), seedPath)
    assert(Retrieval.bm25FromIndex(spark, seedPath).collect().map(_.toString).toSeq
      === fullBm, "grown index must serve like a full build")
    assert(Retrieval.phraseFromIndex(spark, seedPath).collect().map(_.toString).toSeq
      === fullPh)
    val n1 = spark.read.parquet(seedPath).count()
    // at-least-once replay: the same batch again appends nothing
    Retrieval.appendToPostingsIndex(
      docs.filter(col("doc_id") >= 350).select(col("doc_id"), col("text")), seedPath)
    assert(spark.read.parquet(seedPath).count() === n1)
  }

  private def docsSubsetWrite(path: String, subset: org.apache.spark.sql.DataFrame): Unit = {
    // the builder API takes a table dir; for a subset, stage it as the
    // documents table of a scratch dir and build from there
    val stage = TempDirs.scratch("graft_postspec_stage_")
    subset.write.mode("overwrite").parquet(stage.resolve("documents.parquet").toString)
    Retrieval.writePostingsIndex(spark, stage.toString, path)
  }

  test("refreshPostingsMeta recovers deleted sidecars (crash-derived state)") {
    val path = TempDirs.scratch("graft_postspec7_").resolve("idx").toString
    Retrieval.writePostingsIndex(spark, sf, path)
    val before = Retrieval.bm25FromIndex(spark, path).collect().map(_.toString).toSeq
    // simulate a crash that lost the sidecars after an append
    for (sc <- Seq("/_postings_df", "/_postings_meta"))
      TempDirs.delete(java.nio.file.Paths.get(path + sc))
    Retrieval.refreshPostingsMeta(spark, path)
    assert(Retrieval.bm25FromIndex(spark, path).collect().map(_.toString).toSeq
      === before)
  }
}
