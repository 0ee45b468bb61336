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

  test("topN face: exactly the full face's top-5 per bucket, output bounded") {
    try {
      val full = Dedup.dedupMinhash(spark, sf01).collect()
        .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
          r.getAs[Long]("matches"), r.getAs[Double]("est_jaccard")))
      CacheScope.releaseAll()
      assert(full.nonEmpty, "fixture yields no pairs — subset proof vacuous")
      // reference ranking, computed independently of the engine's window:
      // per bucket, matches DESC then (d1, d2) ASC, top 5
      val expect = full.groupBy { case (d1, _, _, _) => (d1 % 64).toInt }
        .toSeq.flatMap { case (b, rows) =>
          rows.sortBy { case (d1, d2, m, _) => (-m, d1, d2) }.take(5)
            .zipWithIndex.map { case ((d1, d2, m, e), i) =>
              (b, (i + 1).toLong, d1, d2, m, e) }.toSeq
        }.toSet
      val got = Dedup.dedupMinhashTopN(spark, sf01).collect()
        .map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("rn"),
          r.getAs[Long]("d1"), r.getAs[Long]("d2"),
          r.getAs[Long]("matches"), r.getAs[Double]("est_jaccard"))).toSet
      assert(got === expect, "topN face diverged from the full face's ranking")
      // the boundedness that makes the face's x10 ratio output-free
      assert(got.size <= 64 * Dedup.PairTopNPerBucket,
        s"output ${got.size} exceeds the 64 x 5 bound")
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
