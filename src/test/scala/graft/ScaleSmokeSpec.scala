package graft

import org.apache.spark.sql.functions._

/** The derived-corpus invariants behind the NOTES scale-proof table:
  * each ScaleSmoke copy must be an exact within-copy bijection of the
  * base fixture (identical duplicate/fingerprint structure) while
  * sharing NOTHING across copies at any granularity the engine
  * fingerprints — the property whose two failed predecessors
  * (token prefixes, Caesar rotation) quadratically inflated the
  * shingle families' candidate stages. */
class ScaleSmokeSpec extends SparkFunSuite {

  private def build(factor: Int): String = {
    val out = TempDirs.scratch("graft_smokespec_").toString
    ScaleSmoke.buildScaled(spark, sf, factor, out)
    out
  }

  test("each copy preserves within-copy set structure exactly (Jaccard pairs, tf/df, length)") {
    // What a char BIJECTION preserves exactly: every SET-structural
    // relation — trigram/token set intersections (so ngram-Jaccard
    // pairs), tf/df histograms, text lengths. (Hash-ORDER-dependent
    // selections — minhash signatures, winnow minima — are permuted by
    // design; their pair GUARANTEES hold but their incidental pair sets
    // vary, which is why the NOTES table reads those families by output
    // counts, not bit-equality.)
    val out = build(2)
    val scaled = spark.read.parquet(s"$out/documents.parquet")
    val base = spark.read.parquet(s"$sf/documents.parquet")
    assert(scaled.count() === 2 * base.count())
    val stage = TempDirs.scratch("graft_smokespec_stage_")
    scaled.filter(col("doc_id") >= 1000000000L)
      .write.mode("overwrite").parquet(stage.resolve("documents.parquet").toString)
    // exact-Jaccard dedup pairs: bijection ⇒ identical pair set
    // (shifted ids), identical intersection sizes and jaccard values
    val basePairs = operators.Dedup.dedupNgram(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
        r.getAs[Long]("inter"))).toSet
    CacheScope.releaseAll()
    val copyPairs = operators.Dedup.dedupNgram(spark, stage.toString).collect()
      .map(r => (r.getAs[Long]("d1") - 1000000000L,
        r.getAs[Long]("d2") - 1000000000L, r.getAs[Long]("inter"))).toSet
    CacheScope.releaseAll()
    assert(copyPairs === basePairs,
      "copy 1's exact-Jaccard pair structure diverged — not a set bijection")
    assert(basePairs.nonEmpty, "fixture degenerate — bijection proof vacuous")
    // 1:1 char map: per-doc lengths unchanged
    val badLen = scaled.filter(col("doc_id") >= 1000000000L)
      .select((col("doc_id") - 1000000000L).as("doc_id"),
        length(col("text")).as("l1"))
      .join(base.select(col("doc_id"), length(col("text")).as("l0")), "doc_id")
      .filter(col("l1") =!= col("l0")).count()
    assert(badLen === 0, "character map changed text lengths")
    // token-level tf/df histogram shape: the multiset of per-token
    // document frequencies is invariant under a token bijection
    def dfHist(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .distinct().groupBy(col("t")).count()
      .groupBy(col("count")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dfHist(scaled.filter(col("doc_id") >= 1000000000L)) === dfHist(base),
      "token df histogram diverged — BM25 stats not preserved")
  }

  test("copies share nothing: zero cross-copy trigram and token overlap") {
    val out = build(3)
    val scaled = spark.read.parquet(s"$out/documents.parquet")
    def grams(copyLo: Long, copyHi: Long) = scaled
      .filter(col("doc_id") >= copyLo && col("doc_id") < copyHi)
      .select(explode(expr(
        """transform(sequence(1, greatest(length(text) - 2, 0)),
          |  i -> substring(text, i, 3))""".stripMargin)).as("g"))
      .distinct()
    val overlap01 = grams(0L, 1000000000L)
      .join(grams(1000000000L, 2000000000L), "g").count()
    val overlap12 = grams(1000000000L, 2000000000L)
      .join(grams(2000000000L, 3000000000L), "g").count()
    assert(overlap01 === 0 && overlap12 === 0,
      s"cross-copy trigram overlap ($overlap01, $overlap12) — shingle " +
        "families would see phantom cross-copy candidates")
    def toks(copyLo: Long, copyHi: Long) = scaled
      .filter(col("doc_id") >= copyLo && col("doc_id") < copyHi)
      .select(explode(split(col("text"), " ")).as("t")).distinct()
    assert(toks(0L, 1000000000L)
      .join(toks(1000000000L, 2000000000L), "t").count() === 0,
      "cross-copy token overlap — winnow/BM25 would see phantom matches")
  }

  test("digits are bijected too: no verbatim char leaks across copies") {
    // the earlier 26-letter map left digits shared verbatim — cross-copy
    // shingle collisions waiting on a fixture with numbers in it
    import spark.implicits._
    val src = TempDirs.scratch("graft_smokespec_digits_")
    Seq((1L, "version 2 of doc 42 rev 7", "en", "s1", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(src.resolve("documents.parquet").toString)
    Seq((1L, Array.fill(4)(1.0f), "a"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(src.resolve("embeddings.parquet").toString)
    val out = TempDirs.scratch("graft_smokespec_digits_out_").toString
    ScaleSmoke.buildScaled(spark, src.toString, 2, out)
    val leaked = spark.read.parquet(s"$out/documents.parquet")
      .filter(col("doc_id") >= 1000000000L)
      .filter(col("text").rlike("[a-z0-9]")).count()
    assert(leaked === 0, "a letter or digit survived the copy bijection verbatim")
  }

  test("a typo'd mode fails fast, before any fixture work") {
    val e = intercept[IllegalArgumentException] {
      ScaleSmoke.main(Array("/nonexistent", "2", "/nonexistent_out", "hotbuild"))
    }
    assert(e.getMessage.contains("hotbuildonly"),
      "the error must list the supported modes (incl. hotbuildonly)")
  }

  test("hotonly is an accepted mode and its denominator file validates by content") {
    // mode parsing: hotonly present in the supported set (the typo test
    // below asserts the message lists modes; this asserts acceptance —
    // it then fails fast on the MISSING env, not on the mode name)
    val e = intercept[RuntimeException] {
      ScaleSmoke.main(Array("/nonexistent", "2", "/nonexistent_out", "hotonly"))
    }
    assert(e.getMessage.contains("SPARK_GRAFT_NO_HOT_FILE"),
      s"hotonly without a denominator file must name the env var, got: ${e.getMessage}")
    // loadNoHotFile: a real fleet artifact passes, a wrong artifact
    // (parseable numbers, no guarded queries) fails by name
    val dir = TempDirs.scratch("graft_smokespec_nohot_")
    val good = dir.resolve("no_hot_sec.json")
    java.nio.file.Files.writeString(good,
      """{"q_bm25_batch":16.80,"q_dedup_minhash":4.20}""" + "\n")
    assert(ScaleSmoke.loadNoHotFile(good.toString) ===
      Map("q_bm25_batch" -> 16.8, "q_dedup_minhash" -> 4.2))
    val wrong = dir.resolve("ratios_from_another_era.json")
    java.nio.file.Files.writeString(wrong, """{"q_something_else":1.00}""")
    val bad = intercept[IllegalArgumentException] {
      ScaleSmoke.loadNoHotFile(wrong.toString)
    }
    assert(bad.getMessage.contains("no guarded-query rows"))
  }

  test("readRatioFile round-trips the ratio map this object writes") {
    val dir = TempDirs.scratch("graft_smokespec_ratios_")
    val p = dir.resolve("ratios.json")
    java.nio.file.Files.writeString(p,
      """{"q_dedup_minhash":4.60,"q_bm25_batch":9.70}""" + "\n")
    assert(ScaleSmoke.readRatioFile(p.toString) ===
      Map("q_dedup_minhash" -> 4.6, "q_bm25_batch" -> 9.7))
    // degraded inputs: missing file / garbage → empty map, never a throw
    assert(ScaleSmoke.readRatioFile(dir.resolve("absent.json").toString) === Map.empty)
    java.nio.file.Files.writeString(p, "not json at all")
    assert(ScaleSmoke.readRatioFile(p.toString) === Map.empty)
  }

  test("hot-ratio provenance stanza: readable, skipped by the ratio regex, escaped") {
    // round-19: hot_ratios.json leads with _provenance_mode/_no_hot_src/
    // _reps so the standing mirror is self-describing (the r18 hotonly
    // demo overwrote the fleet baseline and only NOTES recorded it).
    // The stanza must not disturb escalation lookups: string values are
    // invisible to readRatioFile's quoted-key:number regex, the numeric
    // _provenance_reps lands in the map but collides with no guarded
    // query name.
    val dir = TempDirs.scratch("graft_smokespec_prov_")
    val p = dir.resolve("hot_ratios.json")
    java.nio.file.Files.writeString(p,
      """{"_provenance_mode":"fleet","_provenance_no_hot_src":"fleet",""" +
        """"_provenance_reps":1,"q_bm25_batch":4.17,"q_winnow_matches":1.53}""" + "\n")
    val m = ScaleSmoke.readRatioFile(p.toString)
    assert(m("q_bm25_batch") === 4.17 && m("q_winnow_matches") === 1.53)
    assert(!m.contains("_provenance_mode") && !m.contains("_provenance_no_hot_src"))
    assert(ScaleSmoke.guardedQueries.forall(q => !q.startsWith("_provenance")))
    // the file also validates as a hotonly denominator source shape
    assert(json.parseable(p), "provenance stanza broke JSON validity")
    // jsonStr: the user-supplied no-hot path is escaped, not interpolated
    assert(ScaleSmoke.jsonStr("""/tmp/a"b\c""") === """"/tmp/a\"b\\c"""")
    assert(ScaleSmoke.jsonStr("x\ny") === "\"x\\ny\"")
  }

  private object json {
    // a real parse (Spark's bundled Jackson), not a structural heuristic:
    // the earlier leading/trailing-brace + even-quote check passed
    // malformed output like {"a":} and could not catch the breakage the
    // assertion claims to guard
    def parseable(p: java.nio.file.Path): Boolean =
      try {
        val t = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(t)
        node != null && node.isObject
      } catch { case scala.util.control.NonFatal(_) => false }
  }

  test("embedding copies keep norms exactly and decorrelate across copies") {
    graft.functions.VectorFunctions.register(spark)
    val out = build(2)
    val scaled = spark.read.parquet(s"$out/embeddings.parquet")
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val drift = scaled.filter(col("vec_id") >= 1000000000L)
      .select((col("vec_id") - 1000000000L).as("vec_id"),
        expr("vec_dot(embedding, embedding)").as("n1"))
      .join(base.select(col("vec_id"),
        expr("vec_dot(embedding, embedding)").as("n0")), "vec_id")
      .filter(abs(col("n1") - col("n0")) > 1e-3).count()
    assert(drift === 0, "dimension rotation changed vector norms")
  }
}
