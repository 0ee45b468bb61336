package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-duplicate pre-collapse for the cluster pipeline
  * (`spark.graft.dedup.exactCollapse`, ON in the scale preset): the
  * component PARTITION and labels must be identical to the uncollapsed
  * MinHash pipeline, while signatures/banding run over one
  * representative per md5(text)-identical group and the other members
  * ride rep→member edges. The equivalence argument lives on
  * [[graft.operators.Dedup.collapsedClusterEdges]]; this spec pins it
  * on an adversarial corpus where the collapse actually bites (two
  * 40-doc identical groups that are ALSO near-dups of each other —
  * same token set, different text), plus the null-text exclusion and
  * the d1<d2 edge contract CC requires. */
class ExactCollapseSpec extends SparkFunSuite {

  private def docsDf(rows: Seq[(java.lang.Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id.longValue, Option(t)) }
      .toDF("doc_id", "text")
  }

  // Group A (ids 0-39): one text, 40 exact copies. Group B (ids 40-79):
  // the SAME TOKEN SET in a different order — a different md5 (so a
  // different exact group) but an IDENTICAL minhash signature
  // (signaturesOf hashes the distinct-token set), so A and B are
  // guaranteed cross-group near-dups with matches = width, no hash luck
  // needed. Plus one identical cold pair, one singleton, two null-text
  // docs (one of them duplicated — the trap: md5(null) groups them).
  private val textA = "alpha bravo charlie delta echo foxtrot golf hotel"
  private val textB = "bravo alpha charlie delta echo foxtrot golf hotel"
  private lazy val corpus = docsDf(
    (0L until 40L).map(i => (java.lang.Long.valueOf(i), textA)) ++
      (40L until 80L).map(i => (java.lang.Long.valueOf(i), textB)) ++
      Seq(
        (java.lang.Long.valueOf(200L), "cold1 cold2 cold3 cold4 cold5 cold6"),
        (java.lang.Long.valueOf(201L), "cold1 cold2 cold3 cold4 cold5 cold6"),
        (java.lang.Long.valueOf(300L), "alone1 alone2 alone3 alone4 alone5 alone6"),
        (java.lang.Long.valueOf(400L), null),
        (java.lang.Long.valueOf(401L), null)))

  private def partition(edges: DataFrame): Map[Long, Long] = {
    val m = Dedup.connectedComponentsWithRounds(edges)._1.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("lbl")).toMap
    CacheScope.releaseAll()
    m
  }

  private def collapsedEdges(cap: Int): Seq[(Long, Long)] = {
    val e = Dedup.collapsedClusterEdges(corpus, cap).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSeq
    CacheScope.releaseAll()
    e
  }

  test("collapsed partition equals the uncollapsed pipeline's, unguarded") {
    val off = partition(Dedup.minhashPairsGuarded(corpus, cap = 0))
    val on = partition(Dedup.collapsedClusterEdges(corpus, cap = 0))
    assert(on === off, "exact collapse changed the component partition")
    // and the partition is the expected one: A ∪ B one component labeled
    // by the global min, the cold pair its own, singleton and null-text
    // docs absent
    assert(off === ((0L until 80L).map(_ -> 0L) ++ Seq(200L -> 200L, 201L -> 200L)).toMap)
  }

  test("collapse does the work on representatives: O(groups) edges, not O(members^2)") {
    val edges = collapsedEdges(cap = 0)
    assert(edges.size === edges.toSet.size, "duplicate edges")
    // 1 rep-level near-dup pair (A-rep 0, B-rep 40) + 39 + 39 member
    // edges + 1 cold member edge = 80 — vs the uncollapsed band join's
    // 80·79/2 + 1 = 3161 (the exact-dup mass never reaches the join)
    assert(edges.size === 80)
    assert(edges.contains((0L, 40L)), "rep-level near-dup pair lost")
    val uncollapsed = Dedup.minhashPairsGuarded(corpus, cap = 0).count()
    CacheScope.releaseAll()
    assert(uncollapsed === 80L * 79 / 2 + 1)
  }

  test("edges honor the CC contract: d1 < d2, reps are group minima") {
    val edges = collapsedEdges(cap = 0)
    assert(edges.forall { case (d1, d2) => d1 < d2 })
    // every member edge points at its group's minimum id
    assert(edges.filter(_._2 < 40L).forall(_._1 == 0L))
    assert(edges.filter(e => e._2 >= 40L && e._2 < 80L).forall(e => e._1 == 0L || e._1 == 40L))
    assert(edges.contains((200L, 201L)))
  }

  test("collapse de-hots an exact-dup bucket: guard never engages on reps") {
    // cap 30 < the 80-doc shared bucket: the UNCOLLAPSED run needs the
    // md5-star guard path; the collapsed run's band join sees 2 reps in
    // that bucket — cold — so it runs the exact unguarded plan and the
    // partition still equals the cap=0 truth. (This is the "strictly
    // better under exact-dup-driven hot buckets" half: near-dup edges
    // between reps survive where the guard would have starred or
    // dropped them.)
    val truth = partition(Dedup.collapsedClusterEdges(corpus, cap = 0))
    assert(partition(Dedup.collapsedClusterEdges(corpus, cap = 30)) === truth)
    assert(collapsedEdges(cap = 30).size === 80,
      "guard machinery engaged on a de-hotted bucket")
    // the uncollapsed guarded run also connects A ∪ B here (identical
    // signatures share the guard's identity key), so partitions agree —
    // the collapse advantage is the edge economy, proven above
    assert(partition(Dedup.minhashPairsGuarded(corpus, cap = 30)) === truth)
  }

  test("null-text docs cluster in neither face") {
    val off = partition(Dedup.minhashPairsGuarded(corpus, cap = 0))
    val on = partition(Dedup.collapsedClusterEdges(corpus, cap = 0))
    assert(!off.contains(400L) && !off.contains(401L))
    assert(!on.contains(400L) && !on.contains(401L),
      "member edges invented clusters for null-text docs")
  }

  test("random corpora: collapse is partition-identical unguarded, never splits guarded") {
    // Seeded randomized evidence beyond the fixed corpus: duplicate
    // groups of assorted sizes plus a random tail that may collide by
    // chance. Unguarded, the partitions must be EQUAL. Under a cap the
    // uncollapsed guard may drop non-identical hot-bucket pairs that the
    // de-hotted collapsed run keeps, so the collapsed partition may be
    // coarser — but it must never SPLIT a component the guarded run
    // connects (every uncollapsed edge's connectivity survives: cold
    // buckets only shrink when dup mass leaves, and md5/signature-star
    // groups stay connected through member edges).
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    def randText() =
      Seq.fill(6 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    for (trial <- 1 to 3) {
      val groupTexts = Seq.fill(4)(randText())
      val rows = (0 until 4).flatMap { g =>
        (0 until Seq(40, 25, 8, 2)(g)).map(i =>
          (java.lang.Long.valueOf(g * 1000L + i), groupTexts(g)))
      } ++ (0 until 30).map(i => (java.lang.Long.valueOf(5000L + i), randText()))
      val docs = docsDf(rows)
      val off = partition(Dedup.minhashPairsGuarded(docs, cap = 0))
      val on = partition(Dedup.collapsedClusterEdges(docs, cap = 0))
      assert(on === off, s"trial $trial: unguarded partitions diverged")
      for (cap <- Seq(3, 10, 30)) {
        val guardedOff = partition(Dedup.minhashPairsGuarded(docs, cap))
        val guardedOn = partition(Dedup.collapsedClusterEdges(docs, cap))
        // group nodes by their guarded-uncollapsed component; each such
        // component must map into exactly one collapsed component
        guardedOff.groupBy(_._2).foreach { case (lbl, members) =>
          val collapsed = members.keys.map(guardedOn.get).toSet
          assert(collapsed.size === 1 && !collapsed.contains(None),
            s"trial $trial cap $cap: collapse split/dropped component $lbl")
        }
      }
    }
  }

  test("adaptive skip: below collapseMinDupFrac the uncollapsed plan runs, output-identical") {
    // 100 distinct docs, ONE exact dup pair → dup frac 1/101 ≈ 0.0099.
    // Pin both sides of the threshold with explicit conf values: at 0.02
    // the probe must SKIP (uncollapsed plan, no member edges — edge set
    // equals the plain band join's), at 0.005 it must ENGAGE (the dup
    // pair arrives as a member edge). Partitions are identical either
    // way — that's what makes the always-on preset non-regressing.
    def text(i: Long) = s"tok${i}a tok${i}b tok${i}c tok${i}d tok${i}e tok${i}f"
    val docs = docsDf((0L until 100L).map(i => (java.lang.Long.valueOf(i), text(i))) :+
      ((java.lang.Long.valueOf(100L), text(0L)))) // byte-identical dup of doc 0
    val off = partition(Dedup.minhashPairsGuarded(docs, cap = 0))
    val skipsBefore = Dedup.collapseSkipped.get()
    val skipped = partition(
      Dedup.collapsedClusterEdges(docs, cap = 0, minDupFracOverride = Some(0.02)))
    assert(Dedup.collapseSkipped.get() === skipsBefore + 1,
      "dup frac 0.0099 < 0.02 must take the skip path")
    assert(skipped === off)
    val engagedBefore = Dedup.collapseEngaged.get()
    val engaged = partition(
      Dedup.collapsedClusterEdges(docs, cap = 0, minDupFracOverride = Some(0.005)))
    assert(Dedup.collapseEngaged.get() === engagedBefore + 1,
      "dup frac 0.0099 >= 0.005 must engage the collapse")
    assert(engaged === off)
    // and the session conf is the dial the preset uses (override absent)
    try {
      spark.conf.set("spark.graft.dedup.collapseMinDupFrac", "0.02")
      val before = Dedup.collapseSkipped.get()
      partition(Dedup.collapsedClusterEdges(docs, cap = 0))
      assert(Dedup.collapseSkipped.get() === before + 1)
    } finally spark.conf.unset("spark.graft.dedup.collapseMinDupFrac")
  }

  test("the forced-on catalog face engages the collapse even on the dup-free fixture") {
    val before = Dedup.collapseEngaged.get()
    val face = Dedup.dedupClustersCollapsed(spark, sf)
    face.collect()
    CacheScope.releaseAll()
    assert(Dedup.collapseEngaged.get() === before + 1,
      "q_dedup_clusters_collapsed must gate the collapse machinery, not the skip path")
  }

  test("end-to-end conf flip: dedupClusters output identical on the fixture") {
    def rows() = {
      val r = Dedup.dedupClusters(spark, sf).collect().map(_.toString).toSeq
      CacheScope.releaseAll()
      r
    }
    val off = rows()
    assert(off.nonEmpty)
    try {
      spark.conf.set("spark.graft.dedup.exactCollapse", "true")
      assert(rows() === off)
    } finally spark.conf.unset("spark.graft.dedup.exactCollapse")
    // and the oracle-gated forced-on face equals the scan face rows
    val face = Dedup.dedupClustersCollapsed(spark, sf).collect().map(_.toString).toSeq
    CacheScope.releaseAll()
    assert(face === off)
  }
}
