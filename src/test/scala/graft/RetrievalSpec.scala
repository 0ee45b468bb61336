package graft

import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.SparkPlan

import graft.operators.{Curation, Retrieval}

/** Independent oracles for the retrieval family and the vote
  * classifier: every test recomputes the statistic from the raw text
  * driver-side (own tokenizer, own integer algebra — no engine code
  * shared) and asserts exact equality, the same bar the DuckDB gate
  * holds at sf0.01. Plus the algebraic bounds that make the fixed-point
  * BM25 trustworthy beyond the fixtures. */
class RetrievalSpec extends SparkFunSuite {

  private def docs(d: String): Seq[(Long, String, Seq[String])] =
    Tables.documents(spark, d)
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(' ').filter(_.nonEmpty).toSeq)).toSeq

  /** The exact rational BM25 from the scaladoc, recomputed with
    * BigInt so any silent Long overflow in the engine would diverge. */
  private def bm25Ref(d: String, terms: Seq[String]): Seq[(Long, Long, Long)] = {
    val all = docs(d)
    val n = BigInt(all.size)
    val a = BigInt(all.map(_._3.size.toLong).sum)
    val dfm = terms.map(t => t -> all.count(_._3.contains(t))).toMap
    all.flatMap { case (id, _, toks) =>
      val contribs = terms.flatMap { t =>
        val tf = BigInt(toks.count(_ == t))
        if (tf == 0) None else {
          val dl = BigInt(toks.size)
          val tfQ6 = (BigInt(22000000) * tf * a) /
            (BigInt(10) * tf * a + BigInt(3) * a + BigInt(9) * dl * n)
          val df = BigInt(dfm(t))
          val idfQ6 = (BigInt(1000000) * (2 * (n - df) + 1)) / (2 * df + 1)
          Some((idfQ6 * tfQ6) / BigInt(1000000))
        }
      }
      if (contribs.isEmpty) None
      else Some((id, contribs.size.toLong, contribs.sum.toLong))
    }.sortBy { case (id, _, s) => (-s, id) }.take(20)
  }

  private def phraseRef(d: String, phrase: Seq[String]): Seq[(Long, Long, Long)] =
    docs(d).flatMap { case (id, _, toks) =>
      val starts = toks.indices.dropRight(phrase.size - 1)
        .filter(i => phrase.indices.forall(k => toks(i + k) == phrase(k)))
      if (starts.isEmpty) None
      else Some((id, starts.size.toLong, starts.min.toLong))
    }.sortBy(_._1)

  private def collectBm(d: String): Seq[(Long, Long, Long)] =
    Retrieval.bm25TopK(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  // ------------------------------------------------------------- BM25

  test("bm25TopK equals the BigInt rational reference at two SFs") {
    for (d <- Seq(sf, "/root/testdata/sf0.01"))
      assert(collectBm(d) === bm25Ref(d, Seq("spark", "query", "window")), s"at $d")
  }

  test("bm25TopK honors spark.graft.search.terms, including a single term") {
    spark.conf.set("spark.graft.search.terms", "customer")
    try {
      val got = collectBm(sf)
      assert(got === bm25Ref(sf, Seq("customer")))
      assert(got.forall(_._2 == 1L), "single-term query: n_terms must be 1")
    } finally spark.conf.unset("spark.graft.search.terms")
  }

  test("tf_q6 saturates below k1+1 and idf_q6 decreases in df") {
    // tf_part < k1+1 = 2.2 ⟹ every contrib ≤ idf_q6 · 2.2; with the
    // fixture's N the odds idf is ≤ 1e6·(2N+1), so score_q6 is bounded —
    // the overflow-safety claim in the scaladoc, checked on real output.
    val n = Tables.documents(spark, sf).count()
    val cap = (BigInt(1000000) * (2 * n + 1) * 2200000 / 1000000).toLong * 3
    assert(collectBm(sf).forall(_._3 <= cap))
    // idf monotonicity on the algebra itself
    def idf(df: Long, nd: Long) = (1000000L * (2 * (nd - df) + 1)) / (2 * df + 1)
    val seq = (1L to 20L).map(idf(_, 20L))
    assert(seq === seq.sorted.reverse)
  }

  test("bm25TopK ranks a doc with more term mass above an empty one") {
    // every returned doc contains ≥1 query term, scores are positive,
    // and the output is (score DESC, doc_id) ordered
    val got = collectBm(sf)
    assert(got.nonEmpty && got.forall(_._3 > 0))
    assert(got === got.sortBy { case (id, _, s) => (-s, id) })
  }

  test("bm25TopK broadcasts the df side of the scoring join") {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan +: walk(a.executedPlan)
      case q: QueryStageExec        => q.plan +: walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    val df = Retrieval.bm25TopK(spark, sf)
    df.collect()
    val nodes = walk(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BroadcastExchangeExec]),
      "stats/df joins must be broadcast, not shuffled")
  }

  // ------------------------------------------------------- batch BM25

  private def bm25BatchRef(d: String, k: Int): Seq[(Long, Long, Long, Long, Long)] = {
    val all = docs(d)
    val train = all.filter(_._1 % 97 != 0)
    val n = BigInt(train.size)
    val a = BigInt(train.map(_._3.size.toLong).sum)
    val dfm = train.flatMap(_._3.distinct).groupBy(identity)
      .map { case (t, o) => t -> BigInt(o.size) }
    all.filter(_._1 % 97 == 0).flatMap { case (qid, _, qtoks) =>
      val terms = qtoks.distinct
      train.flatMap { case (id, _, toks) =>
        val contribs = terms.flatMap { t =>
          val tf = BigInt(toks.count(_ == t))
          if (tf == 0) None else {
            val dl = BigInt(toks.size)
            val tfQ6 = (BigInt(22000000) * tf * a) /
              (BigInt(10) * tf * a + BigInt(3) * a + BigInt(9) * dl * n)
            val idfQ6 = (BigInt(1000000) * (2 * (n - dfm(t)) + 1)) / (2 * dfm(t) + 1)
            Some((idfQ6 * tfQ6) / BigInt(1000000))
          }
        }
        if (contribs.isEmpty) None
        else Some((qid, id, contribs.size.toLong, contribs.sum.toLong))
      }.sortBy { case (_, id, _, sc) => (-sc, id) }.take(k)
        .zipWithIndex.map { case ((q, id, nt, sc), i) =>
          (q, (i + 1).toLong, id, nt, sc)
        }
    }.sortBy(r => (r._1, r._2))
  }

  test("bm25Batch equals the BigInt reference at two SFs and excludes eval docs") {
    for (d <- Seq(sf, "/root/testdata/sf0.01")) {
      val got = Retrieval.bm25Batch(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      assert(got === bm25BatchRef(d, 5), s"at $d")
      assert(got.nonEmpty)
      assert(got.forall { case (qid, _, id, _, _) =>
        qid % 97 == 0 && id % 97 != 0
      }, "retrieved docs must come from the training side only")
      got.groupBy(_._1).values.foreach { rs =>
        assert(rs.map(_._2).sorted === (1L to rs.size).toSeq, "ranks contiguous")
        assert(rs.size <= 5)
      }
    }
  }

  test("bm25Batch runs through the spilling TopKPerGroup operator, not a corpus window") {
    val df = Retrieval.bm25Batch(spark, sf)
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan +: walk(a.executedPlan)
      case q: QueryStageExec        => q.plan +: walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    assert(walk(df.queryExecution.executedPlan)
      .exists(_.isInstanceOf[graft.plans.TopKPerGroupExec]),
      "per-query top-k must lower to TopKPerGroupExec")
  }

  // ---------------------------------------------------- phrase search

  test("phraseSearch equals a from-scratch scan at two SFs") {
    for (d <- Seq(sf, "/root/testdata/sf0.01")) {
      val got = Retrieval.phraseSearch(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === phraseRef(d, Seq("window", "fast", "query")), s"at $d")
      assert(got.nonEmpty, s"fixture phrase must match at $d")
    }
  }

  test("phraseSearch handles 2-token and repeated-token phrases") {
    for (p <- Seq("table scan", "a a")) {
      spark.conf.set("spark.graft.search.phrase", p)
      try {
        val got = Retrieval.phraseSearch(spark, sf).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        assert(got === phraseRef(sf, p.split(' ').toSeq), s"phrase '$p'")
      } finally spark.conf.unset("spark.graft.search.phrase")
    }
  }

  test("phraseSearch rejects a one-token phrase, naming the conf surface") {
    spark.conf.set("spark.graft.search.phrase", "table")
    try {
      val e = intercept[IllegalArgumentException](
        Retrieval.phraseSearch(spark, sf))
      assert(e.getMessage.contains("phrase"))
    } finally spark.conf.unset("spark.graft.search.phrase")
  }

  // ------------------------------------------------------- classifier

  private def classifierRef(d: String, k: Int): Seq[(Long, Long, Long, Long, Boolean)] = {
    val all = docs(d)
    val pos = Set("src1", "src2", "src3")
    val counts = all.flatMap { case (_, src, toks) => toks.map(t => (t, pos(src))) }
      .groupBy(_._1).map { case (t, occ) =>
        (t, occ.count(_._2).toLong, occ.count(!_._2).toLong)
      }.toSeq
    val pt = counts.map(_._2).sum
    val nt = counts.map(_._3).sum
    val ranked = counts.map { case (t, pc, nc) =>
      val w = (BigInt(1000000) * BigInt(pc + 1) * BigInt(nt + 1) /
        (BigInt(nc + 1) * BigInt(pt + 1))).toLong
      (t, w)
    }.sortBy { case (t, w) => (-w, t) }
    val v = ranked.size
    val vote = ranked.zipWithIndex.map { case ((t, _), i) =>
      val rk = i + 1
      t -> ((if (rk <= k) 1 else 0) + (if (rk > v - k) -1 else 0))
    }.filter(_._2 != 0).toMap
    all.map { case (id, _, toks) =>
      val hits = toks.distinct.flatMap(vote.get)
      val vp = hits.count(_ > 0).toLong
      val vn = hits.count(_ < 0).toLong
      (id, vp, vn, vp - vn, vp - vn > 0)
    }.sortBy(_._1)
  }

  private def collectCls(d: String): Seq[(Long, Long, Long, Long, Boolean)] =
    Curation.qualityClassifier(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq

  test("qualityClassifier equals the from-scratch vote count at two SFs") {
    for (d <- Seq(sf, "/root/testdata/sf0.01"))
      assert(collectCls(d) === classifierRef(d, 8), s"at $d")
  }

  test("qualityClassifier covers every doc and bounds votes by K") {
    val got = collectCls(sf)
    assert(got.size === Tables.documents(spark, sf).count())
    assert(got.forall { case (_, vp, vn, s, p) =>
      vp >= 0 && vp <= 8 && vn >= 0 && vn <= 8 && s == vp - vn && p == (s > 0)
    })
  }

  test("qualityClassifier at 2K > |vocab|: overlap cancels, no duplicate rows") {
    // 31-token vocab; K=20 makes ranks 12..20 land in BOTH ranges — the
    // vote must cancel to 0 there, never emit two rows per token
    spark.conf.set("spark.graft.classifier.vocabK", "20")
    try {
      val got = collectCls(sf)
      assert(got === classifierRef(sf, 20))
      assert(got.map(_._1).distinct.size === got.size)
    } finally spark.conf.unset("spark.graft.classifier.vocabK")
  }

  test("qualityClassifier separates the DSIR target sources on the fixture") {
    // weak-label sanity: the mean score of target-source docs must
    // exceed the off-target mean, else the odds-ratio training learned
    // nothing (a regression guard on the feature selection, not a
    // statistical claim)
    val bySrc = docs("/root/testdata/sf0.01").map { case (id, src, _) => id -> src }.toMap
    val got = collectCls("/root/testdata/sf0.01")
    val (tgt, rest) = got.partition { case (id, _, _, _, _) =>
      Set("src1", "src2", "src3")(bySrc(id))
    }
    def mean(xs: Seq[(Long, Long, Long, Long, Boolean)]) =
      xs.map(_._4).sum.toDouble / xs.size
    assert(mean(tgt) > mean(rest))
  }
}
