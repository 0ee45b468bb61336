package graft

import graft.operators.Dedup
import scala.jdk.CollectionConverters._

/** The production (hash-bucketed, within-file-sorted) pair report must be
  * a LAYOUT change only: identical pair content to the ordered catalog
  * face, bucket = d1 % 64 on every row, every physical file an ordered
  * (d1, d2) run. Runs at sf0.01 — the sf0.001 fixture can legitimately
  * yield zero minhash pairs (CatalogSpec's mayBeEmpty allowlist), which
  * would make the equality vacuous. */
class PairReportSpec extends SparkFunSuite {
  private val sf01 = "/root/testdata/sf0.01"

  test("bucketed pair report: content-equal to ordered face, bucketed by d1, files sorted") {
    val path = TempDirs.scratch("graft_pairrep_spec_").resolve("pairs").toString
    try {
      Dedup.writeMinhashPairReport(spark, sf01, path)
      CacheScope.releaseAll()
      val ordered = Dedup.dedupMinhash(spark, sf01).collect()
        .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
          r.getAs[Long]("matches"), r.getAs[Double]("est_jaccard")))
      assert(ordered.nonEmpty, "fixture yields no pairs — equality would be vacuous")
      val rows = spark.read.parquet(path).collect()
      assert(rows.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
        r.getAs[Long]("matches"), r.getAs[Double]("est_jaccard"))).toSet
        === ordered.toSet, "bucketed report content differs from the ordered face")
      assert(rows.length === ordered.length,
        "row count differs — a pair was dropped or double-written across buckets")
      assert(rows.forall(r =>
        r.getAs[Int]("bucket") === (r.getAs[Long]("d1") % 64).toInt),
        "a row landed outside its d1 % 64 bucket")
      // every physical file must be an internally (d1, d2)-ordered run —
      // the property sortWithinPartitions buys INSTEAD of a global sort
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
        .iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSeq
      assert(files.size > 1, "report should split across bucket files")
      for (f <- files) {
        val fr = spark.read.parquet(f).select("d1", "d2").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(fr === fr.sorted, s"file $f is not (d1, d2)-sorted")
      }
    } finally CacheScope.releaseAll()
  }

  /** Independent re-ranking proof shared by the three bounded faces:
    * per k1 % 64 bucket, score DESC then (k1, k2) ASC, top 5 — computed
    * from the FULL face's rows without the engine's window. */
  private def checkTopN(fullRows: Array[(Long, Long, Long, Double)],
      topn: org.apache.spark.sql.DataFrame,
      k1: String, k2: String, score: String, extra: String): Unit = {
    assert(fullRows.nonEmpty, "fixture yields no pairs — subset proof vacuous")
    val expect = fullRows.groupBy { case (a, _, _, _) => (a % 64).toInt }
      .toSeq.flatMap { case (b, rows) =>
        rows.sortBy { case (a, c, m, _) => (-m, a, c) }.take(5)
          .zipWithIndex.map { case ((a, c, m, e), i) =>
            (b, (i + 1).toLong, a, c, m, e) }.toSeq
      }.toSet
    val got = topn.collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("rn"),
        r.getAs[Long](k1), r.getAs[Long](k2),
        r.getAs[Number](score).longValue, r.getAs[Double](extra))).toSet
    assert(got === expect, s"topN($k1) diverged from the full face's ranking")
    assert(got.size <= 64 * Dedup.PairTopNPerBucket,
      s"output ${got.size} exceeds the 64 x 5 bound")
  }

  test("minhash topN face: exactly the full face's top-5 per bucket, bounded") {
    try {
      val full = Dedup.dedupMinhash(spark, sf01).collect()
        .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
          r.getAs[Long]("matches"), r.getAs[Double]("est_jaccard")))
      CacheScope.releaseAll()
      checkTopN(full, Dedup.dedupMinhashTopN(spark, sf01),
        "d1", "d2", "matches", "est_jaccard")
    } finally CacheScope.releaseAll()
  }

  test("ngram topN face: exactly the full face's top-5 per bucket, bounded") {
    try {
      val full = Dedup.dedupNgram(spark, sf01).collect()
        .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
          r.getAs[Number]("inter").longValue, r.getAs[Double]("jaccard")))
      CacheScope.releaseAll()
      checkTopN(full, Dedup.dedupNgramTopN(spark, sf01),
        "d1", "d2", "inter", "jaccard")
    } finally CacheScope.releaseAll()
  }

  test("containment topN face: exactly the full face's top-5 per bucket, bounded") {
    try {
      val full = Dedup.dedupContainment(spark, sf01).collect()
        .map(r => (r.getAs[Long]("contained_id"), r.getAs[Long]("container_id"),
          r.getAs[Number]("inter").longValue, r.getAs[Double]("containment")))
      CacheScope.releaseAll()
      checkTopN(full, Dedup.dedupContainmentTopN(spark, sf01),
        "contained_id", "container_id", "inter", "containment")
    } finally CacheScope.releaseAll()
  }

  test("ngram bucketed report: content-equal to ordered face, bucketed by d1") {
    val path = TempDirs.scratch("graft_ngramrep_spec_").resolve("pairs").toString
    try {
      operators.Dedup.writeNgramPairReport(spark, sf01, path)
      CacheScope.releaseAll()
      val ordered = operators.Dedup.dedupNgram(spark, sf01).collect()
        .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
          r.getAs[Long]("inter"), r.getAs[Double]("jaccard")))
      CacheScope.releaseAll()
      assert(ordered.nonEmpty, "fixture yields no ngram pairs — equality would be vacuous")
      val rows = spark.read.parquet(path).collect()
      assert(rows.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
        r.getAs[Long]("inter"), r.getAs[Double]("jaccard"))).toSet
        === ordered.toSet, "bucketed ngram report content differs from the ordered face")
      assert(rows.length === ordered.length,
        "row count differs — a pair was dropped or double-written across buckets")
      assert(rows.forall(r =>
        r.getAs[Int]("bucket") === (r.getAs[Long]("d1") % 64).toInt),
        "a row landed outside its d1 % 64 bucket")
    } finally CacheScope.releaseAll()
  }

  test("containment bucketed report: content-equal to ordered face, bucketed by contained_id") {
    val path = TempDirs.scratch("graft_contrep_spec_").resolve("pairs").toString
    try {
      operators.Dedup.writeContainmentPairReport(spark, sf01, path)
      CacheScope.releaseAll()
      val ordered = operators.Dedup.dedupContainment(spark, sf01).collect()
        .map(r => (r.getAs[Long]("contained_id"), r.getAs[Long]("container_id"),
          r.getAs[Long]("inter"), r.getAs[Double]("containment")))
      CacheScope.releaseAll()
      assert(ordered.nonEmpty, "fixture yields no containment pairs — equality would be vacuous")
      val rows = spark.read.parquet(path).collect()
      assert(rows.map(r => (r.getAs[Long]("contained_id"), r.getAs[Long]("container_id"),
        r.getAs[Long]("inter"), r.getAs[Double]("containment"))).toSet
        === ordered.toSet, "bucketed containment report content differs from the ordered face")
      assert(rows.length === ordered.length,
        "row count differs — a pair was dropped or double-written across buckets")
      assert(rows.forall(r =>
        r.getAs[Int]("bucket") === (r.getAs[Long]("contained_id") % 64).toInt),
        "a row landed outside its contained_id % 64 bucket")
    } finally CacheScope.releaseAll()
  }
}
