package graft

import graft.operators.{Dedup, IndexMaintenance, Similarity}
import org.apache.spark.sql.functions.col

/** Conf-gated small-file compaction for the persisted band indexes
  * (`spark.graft.index.compactEvery` / `.compactTargetBytes`). The
  * contract: N micro-batches leave a BOUNDED part-file count with
  * is_new verdicts identical to the never-compacted run, the rewrite is
  * content-identical, and sidecars (the geometry stamp) survive the
  * directory swap. */
class IndexCompactionSpec extends SparkFunSuite {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val baseDocs = (0L until 5L).map(i =>
    i -> s"base${i}a base${i}b base${i}c base${i}d base${i}e base${i}f")

  // batch i: one novel doc (100+i) and, from batch 1 on, one duplicate
  // of the PREVIOUS batch's novelty (200+i) — so verdicts exercise the
  // grown index across every compaction boundary
  private def batch(i: Int): Seq[(Long, String)] = {
    val novel = (100L + i) -> s"novel${i}a novel${i}b novel${i}c novel${i}d novel${i}e novel${i}f"
    if (i == 0) Seq(novel)
    else Seq(novel, (200L + i) ->
      s"novel${i - 1}a novel${i - 1}b novel${i - 1}c novel${i - 1}d novel${i - 1}e novel${i - 1}f")
  }

  private def runBatches(idx: String, n: Int): Seq[Map[Long, Boolean]] =
    (0 until n).map { i =>
      Dedup.dedupBatchAndGrowIndex(docsDf(batch(i)), idx).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_new")).toMap
    }

  test("direct compact: content-identical, one file, sidecar preserved") {
    val idx = TempDirs.scratch("graft_compact_idx_").resolve("base").toString
    Dedup.writeSignatureIndex(docsDf(baseDocs), idx)
    for (i <- 0 until 4)
      Dedup.appendToSignatureIndex(docsDf(batch(i)), idx)
    val before = spark.read.parquet(idx).collect().map(_.toString).sorted.toSeq
    val filesBefore = IndexMaintenance.partFileCount(spark, idx)
    assert(filesBefore >= 5, s"fixture not fragmented: $filesBefore files")
    IndexMaintenance.compact(spark, idx, targetBytes = 1L << 30)
    assert(IndexMaintenance.partFileCount(spark, idx) === 1)
    val after = spark.read.parquet(idx).collect().map(_.toString).sorted.toSeq
    assert(after === before, "compaction changed index content")
    // the geometry stamp survived the swap: a mismatched session still fails
    try {
      spark.conf.set("spark.graft.lsh.bands", "4")
      spark.conf.set("spark.graft.lsh.rowsPerBand", "2")
      intercept[IllegalStateException](
        Dedup.dedupBatchAgainstIndex(docsDf(batch(0)), idx))
    } finally {
      spark.conf.unset("spark.graft.lsh.bands")
      spark.conf.unset("spark.graft.lsh.rowsPerBand")
    }
  }

  test("compaction crash recovery: old dir restored, leftovers dropped") {
    val idx = TempDirs.scratch("graft_compact_crash_").resolve("base").toString
    Dedup.writeSignatureIndex(docsDf(baseDocs), idx)
    for (i <- 0 until 2) Dedup.appendToSignatureIndex(docsDf(batch(i)), idx)
    val snapshot = spark.read.parquet(idx).collect().map(_.toString).sorted.toSeq
    val live = new org.apache.hadoop.fs.Path(idx)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash between the two swap renames: live gone, old IS the index
    assert(fs.rename(live, new org.apache.hadoop.fs.Path(idx + "__compact_old")))
    IndexMaintenance.compact(spark, idx, targetBytes = 1L << 30)
    assert(spark.read.parquet(idx).collect().map(_.toString).sorted.toSeq === snapshot,
      "recovery + compact lost or changed rows")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx + "__compact_old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx + "__compact_tmp")))
    // crash mid-rewrite: a partial tmp dir beside a complete live index
    fs.mkdirs(new org.apache.hadoop.fs.Path(idx + "__compact_tmp"))
    IndexMaintenance.compact(spark, idx, targetBytes = 1L << 30)
    assert(spark.read.parquet(idx).collect().map(_.toString).sorted.toSeq === snapshot)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx + "__compact_tmp")))
    // geometry stamp survived both recoveries + rewrites
    try {
      spark.conf.set("spark.graft.lsh.bands", "4")
      spark.conf.set("spark.graft.lsh.rowsPerBand", "2")
      intercept[IllegalStateException](
        Dedup.dedupBatchAgainstIndex(docsDf(batch(0)), idx))
    } finally {
      spark.conf.unset("spark.graft.lsh.bands")
      spark.conf.unset("spark.graft.lsh.rowsPerBand")
    }
  }

  test("grow loop under compactEvery: bounded files, verdicts identical") {
    val n = 6
    val plain = TempDirs.scratch("graft_compact_plain_").resolve("base").toString
    Dedup.writeSignatureIndex(docsDf(baseDocs), plain)
    val plainVerdicts = runBatches(plain, n)
    val plainFiles = IndexMaintenance.partFileCount(spark, plain)

    val gated = TempDirs.scratch("graft_compact_gated_").resolve("base").toString
    Dedup.writeSignatureIndex(docsDf(baseDocs), gated)
    spark.conf.set("spark.graft.index.compactEvery", "2")
    val gatedVerdicts =
      try runBatches(gated, n)
      finally spark.conf.unset("spark.graft.index.compactEvery")
    val gatedFiles = IndexMaintenance.partFileCount(spark, gated)

    assert(gatedVerdicts === plainVerdicts,
      "compaction changed a micro-batch's is_new verdicts")
    // expected verdict shape, pinned independently of the twin-run diff
    assert(gatedVerdicts.head === Map(100L -> true))
    for (i <- 1 until n)
      assert(gatedVerdicts(i) === Map((100L + i) -> true, (200L + i) -> false))
    // file-count bound: at most compactEvery survivors plus one batch's
    // appends before the next trigger; the plain run keeps growing
    assert(gatedFiles <= 2 + 4,
      s"compaction did not bound index files: $gatedFiles")
    assert(gatedFiles < plainFiles,
      s"gated run ($gatedFiles files) not smaller than plain ($plainFiles)")
    // grown content identical
    val ids = (p: String) => spark.read.parquet(p)
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(ids(gated) === ids(plain))
  }

  test("vector grow loop under compactEvery: bounded files, verdicts identical") {
    import spark.implicits._
    val dims = 64
    def vec(seed: Int) = Array.tabulate(dims)(k =>
      if ((k + seed) % (seed + 2) == 0) -1.0f else 1.0f)
    val base = (0 until 4).map(j => (j.toLong, vec(j))).toDF("vec_id", "embedding")
    def vbatch(i: Int) = {
      val novel = Seq((100L + i, vec(10 + i)))
      (if (i == 0) novel else novel :+ ((200L + i, vec(10 + i - 1))))
        .toDF("vec_id", "embedding")
    }
    def run(idx: String, every: Option[Int]): (Seq[Map[Long, Boolean]], Int) = {
      Similarity.writeVectorBandIndex(base, idx)
      every.foreach(e => spark.conf.set("spark.graft.index.compactEvery", e.toString))
      val verdicts =
        try (0 until 5).map { i =>
          Similarity.nearDupBatchAndGrowIndex(vbatch(i), idx).collect()
            .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_new")).toMap
        }
        finally spark.conf.unset("spark.graft.index.compactEvery")
      (verdicts, IndexMaintenance.partFileCount(spark, idx))
    }
    val (plainV, plainF) =
      run(TempDirs.scratch("graft_vcompact_plain_").resolve("b").toString, None)
    val (gatedV, gatedF) =
      run(TempDirs.scratch("graft_vcompact_gated_").resolve("b").toString, Some(2))
    assert(gatedV === plainV, "vector compaction changed verdicts")
    assert(gatedF <= 2 + 4 && gatedF < plainF,
      s"vector compaction did not bound files: gated=$gatedF plain=$plainF")
  }

  // ---------------------------------------------- partitioned layouts

  private def bucketFileCounts(path: String): Map[String, Int] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(d => d.isDirectory && d.getPath.getName.contains("="))
      .map(d => d.getPath.getName ->
        fs.listStatus(d.getPath).count(_.getPath.getName.startsWith("part-")))
      .toMap
  }

  test("partitioned grow loop: per-bucket files bounded, serving identical") {
    import graft.operators.Retrieval
    val docs = Tables.documents(spark, sf)
    def grow(idx: String, every: Option[Int]): Seq[String] = {
      val stage = TempDirs.scratch("graft_pcompact_stage_")
      docs.filter(col("doc_id") < 100)
        .write.mode("overwrite").parquet(stage.resolve("documents.parquet").toString)
      Retrieval.writePostingsIndex(spark, stage.toString, idx)
      every.foreach(e => spark.conf.set("spark.graft.index.compactEvery", e.toString))
      try (1 to 4).foreach { i =>
        Retrieval.appendToPostingsIndex(
          docs.filter(col("doc_id") >= i * 100 && col("doc_id") < (i + 1) * 100)
            .select(col("doc_id"), col("text")), idx)
      } finally spark.conf.unset("spark.graft.index.compactEvery")
      Retrieval.bm25FromIndex(spark, idx).collect().map(_.toString).toSeq
    }
    val plain = TempDirs.scratch("graft_pcompact_plain_").resolve("idx").toString
    val gated = TempDirs.scratch("graft_pcompact_gated_").resolve("idx").toString
    val plainServe = grow(plain, None)
    val gatedServe = grow(gated, Some(2))
    assert(gatedServe === plainServe, "partitioned compaction changed serving")
    assert(gatedServe === Retrieval.bm25TopK(spark, sf).collect().map(_.toString).toSeq,
      "grown index drifted from the scan path")
    val plainMax = bucketFileCounts(plain).values.max
    val gatedMax = bucketFileCounts(gated).values.max
    // every batch appends one file per touched bucket: ungated grows to
    // ~5 per hot bucket; gated must stay at the cap + at most one append
    assert(plainMax >= 4, s"fixture not fragmented: plain max/bucket=$plainMax")
    assert(gatedMax <= 3 && gatedMax < plainMax,
      s"per-bucket files not bounded: gated=$gatedMax plain=$plainMax")
    // no transient staging siblings left behind
    val fs = new org.apache.hadoop.fs.Path(gated)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(gated + "__pcompact_tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(gated + "__pcompact_old")))
  }

  test("winnow-index grow loop under compactEvery: bounded buckets, serving identical") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf)
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    val evalDocs = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text"))
    def grow(idx: String): Unit = {
      TextAnalysis.writeWinnowIndexOf(train.filter(col("doc_id") < 100), idx)
      for (b <- 0 until 4)
        TextAnalysis.appendToWinnowIndex(
          train.filter(col("doc_id") >= 100 * (b + 1) &&
            col("doc_id") < 100 * (b + 2)).select(col("doc_id"), col("text")),
          idx)
      // close the gap so both twins index the identical train set
      TextAnalysis.appendToWinnowIndex(
        train.filter(col("doc_id") >= 500).select(col("doc_id"), col("text")), idx)
    }
    def bucketFileCounts(idx: String): Seq[Int] = {
      val root = new org.apache.hadoop.fs.Path(idx)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root)
        .filter(d => d.isDirectory && d.getPath.getName.startsWith("bucket="))
        .map(d => fs.listStatus(d.getPath)
          .count(_.getPath.getName.startsWith("part-"))).toSeq
    }
    val plain = TempDirs.scratch("graft_wincompact_plain_").resolve("idx").toString
    grow(plain)
    val plainServe = TextAnalysis.contaminationFromIndex(evalDocs, plain)
      .collect().map(_.toString).toSeq
    CacheScope.releaseAll()
    val gated = TempDirs.scratch("graft_wincompact_gated_").resolve("idx").toString
    spark.conf.set("spark.graft.index.compactEvery", "2")
    try grow(gated)
    finally spark.conf.unset("spark.graft.index.compactEvery")
    assert(TextAnalysis.contaminationFromIndex(evalDocs, gated)
      .collect().map(_.toString).toSeq === plainServe,
      "compaction changed contamination serving")
    CacheScope.releaseAll()
    // per-bucket bound: at most compactEvery survivors plus one batch's
    // appends before the next trigger; the plain twin keeps growing
    assert(bucketFileCounts(gated).forall(_ <= 2 + 2),
      s"compaction did not bound winnow bucket files: ${bucketFileCounts(gated)}")
    assert(plainServe.nonEmpty, "fixture degenerate — serving proof vacuous")
  }

  test("partitioned compaction crash recovery restores a stranded bucket") {
    import graft.operators.Retrieval
    val idx = TempDirs.scratch("graft_pcompact_crash_").resolve("idx").toString
    Retrieval.writePostingsIndex(spark, sf, idx)
    val before = Retrieval.bm25FromIndex(spark, idx).collect().map(_.toString).toSeq
    val root = new org.apache.hadoop.fs.Path(idx)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucketDir = fs.listStatus(root)
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("bucket="))
      .head.getPath
    // simulate a crash between the two swap renames: live moved to the
    // old staging sibling, nothing swapped in; plus a partial tmp
    val oldRoot = new org.apache.hadoop.fs.Path(idx + "__pcompact_old")
    fs.mkdirs(oldRoot)
    assert(fs.rename(bucketDir, new org.apache.hadoop.fs.Path(oldRoot, bucketDir.getName)))
    fs.mkdirs(new org.apache.hadoop.fs.Path(idx + "__pcompact_tmp/" + bucketDir.getName))
    spark.conf.set("spark.graft.index.compactEvery", "1000000")
    try IndexMaintenance.maybeCompactPartitioned(spark, idx)
    finally spark.conf.unset("spark.graft.index.compactEvery")
    assert(fs.exists(bucketDir), "stranded bucket not restored")
    assert(!fs.exists(oldRoot) &&
      !fs.exists(new org.apache.hadoop.fs.Path(idx + "__pcompact_tmp")))
    assert(Retrieval.bm25FromIndex(spark, idx).collect().map(_.toString).toSeq
      === before, "recovery changed serving")
  }
}
