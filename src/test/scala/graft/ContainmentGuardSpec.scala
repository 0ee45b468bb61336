package graft

import graft.operators.Dedup

/** Adversarial hot-shingle fixtures for the conf-gated containment guard
  * (`spark.graft.containment.maxDocsPerShingle`). The prefix lemma does
  * NOT protect against a boilerplate group: m exact copies make the
  * copies' rarest shingles themselves df = m hot, so every copy keeps
  * them in its prefix and the candidate join emits m·(m−1) directed
  * pairs. The guard must (a) bound the join, (b) keep full recall on
  * exact copies via the identical-set star path, (c) leave cold pairs
  * bit-identical, and (d) be a no-op when the cap exceeds every df. */
class ContainmentGuardSpec extends SparkFunSuite {

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  private def pairs(docs: org.apache.spark.sql.DataFrame, cap: Int) =
    try Dedup.containmentPairsGuarded(docs, cap).collect()
      .map(r => (r.getAs[Long]("contained_id"), r.getAs[Long]("container_id"),
        r.getAs[Long]("inter"), r.getAs[Double]("containment"))).toSet
    finally CacheScope.releaseAll()

  // 150 identical boilerplate docs in one source (every shingle df=150),
  // 10 identical cold pairs with disjoint vocabularies, and one
  // boilerplate copy in a DIFFERENT source (all-hot but not starrable —
  // containment never crosses sources).
  private lazy val hotCorpus = {
    val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val hot = (0L until 150L).map(i => (i, "src1", boiler))
    val cold = (0 until 10).flatMap { j =>
      val t = s"unique${j}aa unique${j}bb unique${j}cc unique${j}dd"
      Seq((1000L + 2 * j, "src1", t), (1001L + 2 * j, "src1", t))
    }
    docsDf(hot ++ cold :+ ((2000L, "src2", boiler)))
  }

  test("guard: hot group stars to its min, cold pairs survive, off-source isolated") {
    val guarded = pairs(hotCorpus, cap = 50)
    // exact-copy recall: every member contained in the group min at 1.0
    val stars = guarded.filter(_._2 == 0L)
    assert(stars.map(p => (p._1, p._4)) ===
      (1L until 150L).map(i => (i, 1.0)).toSet)
    // no pair of two non-min hot docs — the m² blowup is gone
    assert(!guarded.exists(p => p._1 < 150L && p._2 > 0L && p._2 < 150L))
    // cold identical pairs keep BOTH directed edges at containment 1.0
    for (j <- 0 until 10; (a, b) <- Seq(
        (1000L + 2 * j, 1001L + 2 * j), (1001L + 2 * j, 1000L + 2 * j)))
      assert(guarded.exists(p => p._1 == a && p._2 == b && p._4 == 1.0),
        s"cold pair $j lost direction ($a, $b) under guard")
    // the src2 boilerplate copy is all-hot but alone in its source: no edge
    assert(!guarded.exists(p => p._1 == 2000L || p._2 == 2000L))
    // total bound: star g−1 + 20 cold directed edges
    assert(guarded.size === 149 + 20)
  }

  test("guard: unguarded run really is quadratic on the fixture (the hazard exists)") {
    val unguarded = pairs(hotCorpus, cap = 0)
    // all ordered pairs of the 150-copy group (within src1) + 20 cold
    // edges + both directions of the cross-source... none: source key
    assert(unguarded.size === 150 * 149 + 20)
  }

  test("guard: cap above every df is semantics-identical to unguarded on the real corpus") {
    val docs = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("text"))
    val unguarded = pairs(docs, 0)
    assert(unguarded.nonEmpty, "fixture yields no containment pairs — vacuous")
    assert(pairs(docs, 1000000) === unguarded)
  }
}
