package graft

import graft.operators.Dedup

/** Conf-gated LSH band geometry (`spark.graft.lsh.bands` /
  * `spark.graft.lsh.rowsPerBand`, default 2×4 — the oracle-pinned
  * s-curve). Pinned here:
  *
  *  - bit-identity of the default: confs-unset ≡ explicit 2×4;
  *  - the banding CONTAINMENT law for equal-width geometries — a band of
  *    2r rows matching implies both r-row halves match, so finer-banded
  *    geometries of the same signature width find SUPERSETS
  *    (1×8 ⊆ 2×4 ⊆ 4×2) with identical match counts on shared pairs;
  *  - decimal slot-suffix hashing for widths past 10 (the oracle's
  *    `CAST(h AS VARCHAR)`, not a single '0'+h byte);
  *  - the persisted index's geometry stamp: a session whose confs
  *    disagree with the index's recorded geometry fails loudly instead
  *    of silently matching nothing;
  *  - fail-fast validation of degenerate geometry confs.
  */
class GeometrySpec extends SparkFunSuite {

  private def withGeometry(b: Int, r: Int)(body: => Unit): Unit =
    try {
      spark.conf.set("spark.graft.lsh.bands", b.toString)
      spark.conf.set("spark.graft.lsh.rowsPerBand", r.toString)
      body
    } finally {
      spark.conf.unset("spark.graft.lsh.bands")
      spark.conf.unset("spark.graft.lsh.rowsPerBand")
      CacheScope.releaseAll()
    }

  private def pairMap(): Map[(Long, Long), Long] = {
    val m = Dedup.dedupMinhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) ->
        r.getAs[Long]("matches")).toMap
    CacheScope.releaseAll()
    m
  }

  test("default geometry is bit-identical whether confs are unset or explicit 2x4") {
    val unset = pairMap()
    assert(unset.nonEmpty)
    withGeometry(2, 4) { assert(pairMap() === unset) }
  }

  test("containment law: finer banding of the same width finds a superset") {
    val oneBand = withGeometryValue(1, 8)(pairMap())
    val default = pairMap()
    val fine = withGeometryValue(4, 2)(pairMap())
    assert(oneBand.keySet.subsetOf(default.keySet),
      "1x8 found a pair 2x4 missed — banding containment violated")
    assert(default.keySet.subsetOf(fine.keySet),
      "2x4 found a pair 4x2 missed — banding containment violated")
    // match counts come from the same width-8 signatures: equal on shared pairs
    for ((k, v) <- default) assert(fine(k) === v)
    for ((k, v) <- oneBand) assert(default(k) === v)
    // and the finer geometry genuinely widens the s-curve on this corpus
    assert(oneBand.size <= default.size && default.size <= fine.size)
  }

  private def withGeometryValue[A](b: Int, r: Int)(body: => A): A = {
    var out: Option[A] = None
    withGeometry(b, r) { out = Some(body) }
    out.get
  }

  test("a wider signature (3x3) runs with the scaled 75% threshold") {
    withGeometry(3, 3) {
      val m = pairMap()
      // threshold ceil(0.75*9) = 7 slot agreements; matches in [7, 9]
      assert(m.values.forall(v => v >= 7 && v <= 9))
    }
  }

  test("width-40 HOF match path equals JVM-computed truth (8x5)") {
    // widths > 32 switch matchCount/minimalBandOnly to the compact
    // zip_with / array_min HOF expressions — gate them against a truth
    // computed entirely JVM-side (same hash family via the aggregator,
    // independent band/match logic), including exactly-once emission
    import spark.implicits._
    val docs: Seq[(Long, String)] =
      // 10 near-dup pairs sharing 9 of 10 tokens, 2 identical pairs,
      // and 6 unrelated docs
      (0 until 10).flatMap { j =>
        val base = (0 until 9).map(t => s"w${j}t$t").mkString(" ")
        Seq((2L * j, s"$base extraA$j"), (2L * j + 1, s"$base extraB$j"))
      } ++ Seq((100L, "dupX a b c d e"), (101L, "dupX a b c d e"),
        (102L, "dupY f g h i j"), (103L, "dupY f g h i j")) ++
        (0 until 6).map(k => (200L + k,
          (0 until 10).map(t => s"solo${k}t$t").mkString(" ")))
    try {
      spark.conf.set("spark.graft.lsh.bands", "8")
      spark.conf.set("spark.graft.lsh.rowsPerBand", "5")
      val got = operators.Dedup.minhashPairsGuarded(docs.toDF("doc_id", "text"), cap = 0)
        .collect()
        .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("matches")))
        .toSeq
      assert(got.size === got.distinct.size, "a pair was emitted twice")
      // JVM truth: fold each doc's distinct tokens through the aggregator
      val sigs: Map[Long, Array[String]] = docs.map { case (id, text) =>
        val agg = new graft.functions.MinHashAggregator(40)
        id -> text.split(" ").distinct
          .foldLeft(agg.zero)((b, t) => agg.reduce(b, (id, t)))
      }.toMap
      val thr = math.ceil(0.75 * 40).toInt // 30
      val expected = (for {
        i <- sigs.keys; j <- sigs.keys if i < j
        si = sigs(i); sj = sigs(j)
        m = (0 until 40).count(k => si(k) == sj(k))
        bandHit = (0 until 8).exists(b =>
          (0 until 5).forall(r => si(5 * b + r) == sj(5 * b + r)))
        if bandHit && m >= thr
      } yield (i, j, m)).toSet
      assert(expected.nonEmpty, "fixture produced no qualifying pairs")
      assert(got.toSet === expected,
        s"HOF wide path diverged from JVM truth (got ${got.size}, expected ${expected.size})")
    } finally {
      spark.conf.unset("spark.graft.lsh.bands")
      spark.conf.unset("spark.graft.lsh.rowsPerBand")
      CacheScope.releaseAll()
    }
  }

  test("slot suffixes hash in decimal past slot 9 (oracle's CAST(h AS VARCHAR))") {
    val agg = new graft.functions.MinHashAggregator(12)
    val buf = agg.reduce(agg.zero, (1L, "tok"))
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    assert(buf(2) === md5hex("tok#2"))
    assert(buf(9) === md5hex("tok#9"))
    assert(buf(10) === md5hex("tok#10"), "slot 10 must suffix '10', not ':'")
    assert(buf(11) === md5hex("tok#11"))
  }

  test("persisted index carries its geometry; a mismatched session fails loudly") {
    import spark.implicits._
    val docs = (0L until 6L).map(i =>
      (i, s"geo${i}a geo${i}b geo${i}c geo${i}d geo${i}e geo${i}f"))
      .toDF("doc_id", "text")
    val idx = TempDirs.scratch("graft_geom_idx_").resolve("base").toString
    Dedup.writeSignatureIndex(docs, idx) // stamped at the default 2x4
    val batch = Seq((100L, "geo0a geo0b geo0c geo0d geo0e geo0f"))
      .toDF("doc_id", "text")
    // same geometry: the stamp is silent and the match works
    assert(Dedup.dedupBatchAgainstIndex(batch, idx).collect().nonEmpty)
    withGeometry(4, 2) {
      val e = intercept[IllegalStateException](
        Dedup.dedupBatchAgainstIndex(batch, idx))
      assert(e.getMessage.contains("bands=2 rowsPerBand=4") &&
        e.getMessage.contains("bands=4 rowsPerBand=2"),
        s"stamp mismatch error must show both geometries: ${e.getMessage}")
    }
  }

  test("degenerate geometry confs fail fast naming the conf") {
    withGeometry(0, 4) {
      val e = intercept[IllegalArgumentException](pairMap())
      assert(e.getMessage.contains("spark.graft.lsh.bands"))
    }
    try {
      spark.conf.set("spark.graft.lsh.rowsPerBand", "four")
      val e = intercept[IllegalArgumentException](pairMap())
      assert(e.getMessage.contains("spark.graft.lsh.rowsPerBand"))
    } finally spark.conf.unset("spark.graft.lsh.rowsPerBand")
  }
}
