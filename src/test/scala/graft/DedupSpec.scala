package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkFunSuite {

  test("clusters: every LSH pair lands in one cluster; canonicals are minima") {
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Boolean]("is_canonical"))).toMap
    val pairs = Dedup.dedupMinhash(spark, sf)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty && clusters.nonEmpty)
    // connectivity: both endpoints of every edge share a cluster id
    for ((a, b) <- pairs)
      assert(clusters(a)._1 === clusters(b)._1, s"pair ($a,$b) split across clusters")
    // the canonical member IS the cluster id and is unique per cluster
    val canonicals = clusters.collect { case (doc, (cid, _, true)) => (doc, cid) }
    assert(canonicals.forall { case (doc, cid) => doc === cid })
    assert(canonicals.map(_._2).toSeq.distinct.size ===
      clusters.values.map(_._1).toSeq.distinct.size)
    // sizes agree with membership counts
    val bySize = clusters.values.groupBy(_._1).map { case (cid, ms) => cid -> ms.size }
    assert(clusters.values.forall { case (cid, sz, _) => bySize(cid).toLong === sz })
  }

  test("clusters: reliable-checkpoint mode writes durable files and matches the default path") {
    val expected = Dedup.dedupClusters(spark, sf).collect().toSeq
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt-spec").toString
    spark.conf.set("spark.graft.dedup.reliableCheckpoint", "true")
    spark.conf.set("spark.graft.checkpointDir", ckptDir)
    try {
      val durable = Dedup.dedupClusters(spark, sf).collect().toSeq
      assert(durable === expected)
      // the loop's label tables really went through checkpoint(): reliable
      // RDD files exist under the configured dir, which is what a resumed
      // recomputation after executor loss would read instead of the corpus
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"no reliable checkpoint files written under $ckptDir")
    } finally {
      spark.conf.unset("spark.graft.dedup.reliableCheckpoint")
      spark.conf.unset("spark.graft.checkpointDir")
    }
  }

  test("incremental dedup agrees with the full pair set on the delta slice") {
    val full = Dedup.dedupMinhash(spark, sf)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = Dedup.dedupIncremental(spark, sf).collect()
    assert(inc.nonEmpty)
    for (r <- inc) {
      val doc = r.getAs[Long]("doc_id")
      assert(doc % 10 >= 8) // delta slice only
      if (!r.getAs[Boolean]("is_new")) {
        val base = r.getAs[Long]("matched_base")
        // every claimed base match must exist as a full-dedup pair
        // (pairs are ordered d1 < d2; base can be on either side)
        assert(full.contains((math.min(base, doc), math.max(base, doc))),
          s"incremental claims ($base, $doc) but the full pair set lacks it")
      } else {
        assert(r.getAs[Long]("n_base_dups") === 0L)
        // a new doc must have NO base-side pair in the full set
        assert(!full.exists { case (a, b) =>
          (a == doc && b % 10 < 8) || (b == doc && a % 10 < 8) },
          s"doc $doc marked new but has a base pair in the full set")
      }
    }
  }

  test("prefix filter: candidate pairs stay within 10x of final pairs") {
    val (candidates, finalPairs) = Dedup.ngramCandidateStats(spark, sf)
    assert(finalPairs > 0)
    assert(candidates <= 10 * finalPairs,
      s"prefix filter too loose: $candidates candidates for $finalPairs pairs")
  }

  test("shingle guard: texts under 3 chars get an empty set, not bogus shingles") {
    val s = spark
    import s.implicits._
    val guard =
      """CASE WHEN length(text) >= 3
        |  THEN array_sort(array_distinct(transform(
        |    sequence(1, length(text) - 2), i -> xxhash64(substring(text, i, 3)))))
        |  ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin
    val rows = Seq("", "a", "ab", "abc", "abcd").toDF("text")
      .select(col("text"), expr(guard).as("sh"))
      .collect()
      .map(r => r.getAs[String]("text") -> r.getAs[Seq[Long]]("sh").length)
      .toMap
    assert(rows("") === 0 && rows("a") === 0 && rows("ab") === 0)
    assert(rows("abc") === 1) // exactly the one 3-gram
    assert(rows("abcd") === 2)
  }

  test("minhash UDAF signature equals the SQL-path signature per document") {
    val sqlSig = Dedup.queries("q_dedup_minhash") // forces registration
    val udaf = Dedup.minhashUdaf(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("sig_csv")).toMap
    // independent recomputation of one signature via the aggregator alone
    val text = Tables.documents(spark, sf).filter(col("doc_id") === 1)
      .collect().head.getAs[String]("text")
    val tokens = text.split(" ").distinct
    val sig = tokens.foldLeft(graft.functions.MinHashAggregator.zero) {
      (buf, t) => graft.functions.MinHashAggregator.reduce(buf, (1L, t))
    }
    assert(udaf(1L) === graft.functions.MinHashAggregator.finish(sig))
  }

  test("persisted signature index: delta dedups against the FILES, bit-equal to in-query") {
    import org.apache.spark.sql.functions.col
    val idx = TempDirs.scratch("graft_sigindex_spec_").resolve("base").toString
    // ingest: the standing corpus's signatures/bands land on disk ONCE
    Dedup.writeSignatureIndex(
      Tables.documents(spark, sf).filter(col("doc_id") % 10 < 8), idx)
    // a delta batch arrives later: dedup it against the stored index
    val indexed = Dedup.dedupIncrementalFromIndex(spark, sf, idx)
    // the base side must come from the index files, not a recomputation —
    // the plan's input files include the parquet we just wrote, and the
    // only documents scan left is the (pre-filtered) delta derivation
    val inputs = indexed.inputFiles
    assert(inputs.exists(_.contains("graft_sigindex_spec_")),
      s"plan does not read the index: ${inputs.mkString(", ")}")
    val viaIndex = indexed.collect().map(_.toString)
    val inQuery = Dedup.dedupIncremental(spark, sf).collect().map(_.toString)
    CacheScope.releaseAll()
    assert(viaIndex === inQuery, "persisted-index path diverged from in-query")
    assert(viaIndex.nonEmpty)
  }

  test("span profile: position conservation, dup bounds, run length sanity") {
    try {
      val out = Dedup.spanDedup(spark, sf).collect()
      val nToks = Tables.documents(spark, sf)
        .select(col("doc_id"), expr("size(split(text, ' '))").cast("long").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out.length === nToks.count(_._2 >= 10))
      out.foreach { r =>
        val (id, nPos) = (r.getLong(0), r.getAs[Long]("n_pos"))
        val nDup = r.getAs[Long]("n_dup_pos")
        val run = r.getAs[Long]("longest_dup_run")
        assert(nPos === nToks(id) - 9, s"doc $id: position count off")
        assert(nDup <= nPos && run <= nDup,
          s"doc $id: bounds violated ($nPos, $nDup, $run)")
        assert((run == 0) === (nDup == 0), s"doc $id: run/dup flags disagree")
      }
      assert(out.map(_.getAs[Long]("n_dup_pos")).sum > 0,
        "fixture has no repeated 10-gram — test vacuous")
    } finally CacheScope.releaseAll()
  }

  /** Independent JVM re-derivation of [[Dedup.spanRemovalOf]]: gram
    * counting on the gram STRINGS (md5 equality on the engine side is
    * string equality up to negligible collisions), gaps-and-islands in
    * a mutable loop, coverage union via a position set. */
  private def refSpanRemoval(docs: Seq[(Long, String)], minCut: Int)
      : Seq[(Long, Long, Long, Long, String)] = {
    val w = 10
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val grams = toks.flatMap { case (id, ts) =>
      if (ts.length >= w)
        (0 to ts.length - w).map(i => (id, i + 1L, ts.slice(i, i + w).mkString(" ")))
      else Nil
    }
    val cnt = grams.groupBy(_._3).map { case (gr, v) => gr -> v.size }
    toks.map { case (id, ts) =>
      val dupPos = grams.collect {
        case (d, i, gr) if d == id && cnt(gr) > 1 => i
      }.sorted
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for (p <- dupPos) {
        if (runs.nonEmpty && runs.last._1 + runs.last._2 == p)
          runs(runs.size - 1) = (runs.last._1, runs.last._2 + 1)
        else runs += ((p, 1L))
      }
      val cut = runs.filter { case (_, rl) => rl + w - 1 >= minCut }
      val removed = cut.flatMap { case (st, rl) => st to (st + rl + w - 2) }.toSet
      val kept = ts.zipWithIndex.collect { case (t, j) if !removed(j + 1L) => t }
      (id, ts.length.toLong, cut.size.toLong,
        (ts.length - kept.length).toLong, kept.mkString(" "))
    }.sortBy(_._1)
  }

  test("span removal: planted long passage cut on both copies, short passage survives") {
    import spark.implicits._
    val passage = (1 to 60).map(i => s"p$i").mkString(" ")   // 60 tokens ≥ minCut
    val short = (1 to 12).map(i => s"s$i").mkString(" ")     // 12 tokens < minCut
    val docs = Seq(
      1L -> s"${(1 to 10).map(i => s"a$i").mkString(" ")} $passage ${(1 to 10).map(i => s"z$i").mkString(" ")}",
      2L -> s"${(1 to 10).map(i => s"b$i").mkString(" ")} $passage ${(1 to 10).map(i => s"y$i").mkString(" ")}",
      3L -> s"${(1 to 10).map(i => s"c$i").mkString(" ")} $short ${(1 to 10).map(i => s"x$i").mkString(" ")}",
      4L -> s"${(1 to 10).map(i => s"d$i").mkString(" ")} $short ${(1 to 10).map(i => s"w$i").mkString(" ")}",
      5L -> (1 to 40).map(i => s"u$i").mkString(" ")
    ).toDF("doc_id", "text")
    val out = Dedup.spanRemovalOf(spark, docs, 50).collect()
      .map(r => r.getLong(0) -> r).toMap
    // the shared 60-token passage dies on BOTH copies; surroundings survive.
    // The cut run extends w-1 grams into each unique flank (grams
    // STRADDLING the junction are themselves corpus-unique, but every gram
    // fully inside the passage is duplicated) — so removal is exactly the
    // passage: run = 51 positions starting at flank+1, covering 60 tokens.
    for (id <- Seq(1L, 2L)) {
      val r = out(id)
      assert(r.getAs[Long]("n_spans_cut") === 1L)
      assert(r.getAs[Long]("n_removed") === 60L, s"doc $id removed wrong span")
      val clean = r.getAs[String]("text_clean")
      assert(!clean.contains("p1 "), s"doc $id passage survived")
      assert(clean.split(" ").length === 20, s"doc $id flanks damaged")
    }
    // the 12-token shared passage is detected as dup but under the cut bar
    for (id <- Seq(3L, 4L, 5L)) {
      val r = out(id)
      assert(r.getAs[Long]("n_removed") === 0L, s"doc $id wrongly cut")
      assert(r.getAs[Long]("n_spans_cut") === 0L)
    }
    // and the whole frame agrees with the independent reference
    val got = Dedup.spanRemovalOf(spark, docs, 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1).toSeq
    assert(got === refSpanRemoval(docs.as[(Long, String)].collect().toSeq, 50))
  }

  test("span removal: engine equals the JVM reference on the real corpus at two thresholds") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    for (minCut <- Seq(50, 20)) {
      val got = Dedup.spanRemovalOf(spark, Tables.documents(spark, sf), minCut)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .sortBy(_._1).toSeq
      assert(got === refSpanRemoval(docs, minCut), s"mismatch at minCut=$minCut")
    }
    // the catalog gate (minCut=50) must certify real cuts, not a no-op
    val cutDocs = Dedup.spanRemoval(spark, sf)
      .filter(col("n_removed") > 0).count()
    assert(cutDocs > 0, "no spans cut at sf0.001 — the oracle gate would be vacuous")
  }
}
