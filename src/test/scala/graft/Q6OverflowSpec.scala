package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, EventsOps, Retrieval}

/** Overflow property sweep over EVERY multi-factor q6 fixed-point
  * product in main, driven at adversarial (100-TB-and-beyond) magnitudes
  * against driver-side BigInt references. Round 11 found two silent Long
  * wraps (BM25's idf·tf, the classifier's 1e6·(pc+1)·(nt+1)) behind
  * scaladoc envelopes that claimed safety; this suite makes every
  * sibling either DECIMAL-exact at scale or loudly-guarded.
  *
  * Sites NOT here, and why they cannot wrap:
  * - tfidfTopTerms / qualityScore: pure IEEE doubles, correctly-rounded
  *   identical in any engine, no DIV.
  * - Dedup prefix bounds ((3n+4) DIV 5, (4n+4) DIV 5), heavy-hitter
  *   COUNT(*) DIV 50, DSIR quota (n+3) DIV 4, Parity n_lines DIV 5,
  *   Corpus running DIV budget: single-factor DIVs whose operand is a
  *   row/token count ≤ corpus cardinality — Long holds any corpus below
  *   ~9e18 rows, five orders past 100 TB.
  * - TopKPerGroupPlan: guarded by its own 2^53 throw (TopKPlanSpec).
  * - anomalyZscore decimal(38) products: the loud raise_error guard,
  *   pinned below. */
class Q6OverflowSpec extends SparkFunSuite {

  test("BM25 q6 scoring is BigInt-exact at 100-TB-scale (N, A)") {
    import spark.implicits._
    // N = 1e11 docs, A = 2e13 tokens — the design point. In pure Long
    // arithmetic 22e6·tf·A wraps at tf·A ≥ 4.2e11, i.e. for EVERY row
    // here; the DECIMAL widening must agree with BigInt exactly.
    val nD = 100000000000L
    val aL = 20000000000000L
    val hits = Seq(
      (1L, 200L, "alpha", 50L), (1L, 200L, "beta", 3L),
      (2L, 1000000L, "alpha", 1000000L), // pathological: tf = dl = 1e6
      (3L, 5L, "beta", 1L))
      .toDF("doc_id", "dl", "token", "tf")
    val dfs = Seq(("alpha", 1L), ("beta", 40000000000L)) // df=1: max idf
      .toDF("token", "df")
    def ref(rows: Seq[(Long, Long, Long, Long)]): Map[Long, Long] = {
      def tfq(tf: BigInt, dl: BigInt) =
        (BigInt(22000000) * tf * aL) /
          (BigInt(10) * tf * aL + BigInt(3) * aL + BigInt(9) * dl * nD)
      def idfq(df: BigInt) =
        (BigInt(1000000) * (2 * (BigInt(nD) - df) + 1)) / (2 * df + 1)
      rows.groupBy(_._1).map { case (doc, rs) =>
        doc -> rs.map { case (_, dl, df, tf) =>
          (idfq(df) * tfq(tf, dl) / 1000000).toLong
        }.sum
      }
    }
    val expected = ref(Seq(
      (1L, 200L, 1L, 50L), (1L, 200L, 40000000000L, 3L),
      (2L, 1000000L, 1L, 1000000L), (3L, 5L, 40000000000L, 1L)))
    val got = Retrieval.bm25ScoreFrom(hits, dfs, nD, aL).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_q6")).toMap
    assert(got === expected)
    // every score must be positive and sane — a Long wrap would have
    // produced a negative or absurd value
    assert(got.values.forall(v => v > 0))
  }

  test("tf_q6 stays in [0, 2.2e6) and idf_q6 positive across random magnitudes") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300) {
      val dl = 1L + rnd.nextInt(1000000)
      (math.min(1L + rnd.nextInt(10000).toLong, dl), dl,
        // & Long.MaxValue, not math.abs: abs(Long.MinValue) is negative
        1L + (rnd.nextLong() & Long.MaxValue) % 1000000000000L)
    }
    for ((nD, aL) <- Seq((1000L, 200000L), (100000000000L, 20000000000000L),
        (10000000000000L, 1000000000000000L))) {
      val got = rows.toDF("tf", "dl", "df")
        .withColumn("df", least(col("df"), lit(nD))) // df ≤ N
        .select(Retrieval.tfQ6Expr(nD, aL).as("tfq"),
          Retrieval.idfQ6Expr(nD).as("idfq"))
        .collect()
      got.foreach { r =>
        val tfq = r.getAs[Long]("tfq")
        assert(tfq >= 0 && tfq < 2200000, s"tf_q6 out of range at N=$nD: $tfq")
        assert(r.getAs[Long]("idfq") >= 0, s"idf_q6 negative at N=$nD")
      }
    }
  }

  test("DSIR bucket ratio is BigInt-exact past the old 9.2e12 Long cliff") {
    import spark.implicits._
    // tc ≤ rc per bucket by construction; tc near 1e13 used to wrap
    // 1e6·(tc+1) silently
    val cases = Seq(
      (0L, 0L), (1L, 5L), (9223372036854L, 9223372036854L), // the old cliff
      (10000000000000L, 20000000000000L), // 10 PB-bucket scale
      (9999999999999999L, 9999999999999999L))
    val got = cases.toDF("tc", "rc")
      .select(col("tc"), col("rc"), Curation.dsirRatioQ6Expr.as("r"))
      .collect()
    got.foreach { r =>
      val (tc, rc) = (BigInt(r.getAs[Long]("tc")), BigInt(r.getAs[Long]("rc")))
      val expect = (BigInt(1000000) * (tc + 1) / (rc + 1)).toLong
      assert(r.getAs[Long]("r") === expect, s"tc=$tc rc=$rc")
      assert(r.getAs[Long]("r") >= 0 && r.getAs[Long]("r") <= 1000000)
    }
  }

  test("classifier odds weight is BigInt-exact at adversarial class totals") {
    import spark.implicits._
    val (pt, nt) = (10000000000000L, 30000000000000L) // 4e13-token corpus
    val cases = Seq((0L, 1000000000000L), (100000L, 0L),
      (9999999999999L, 1L), (1L, 29999999999999L))
    val got = cases.toDF("pc", "nc")
      .select(col("pc"), col("nc"), Curation.classifierWq6Expr(pt, nt).as("w"))
      .collect()
    got.foreach { r =>
      val (pc, nc) = (BigInt(r.getAs[Long]("pc")), BigInt(r.getAs[Long]("nc")))
      val expect = (BigInt(1000000) * (pc + 1) * (BigInt(nt) + 1) /
        ((nc + 1) * (BigInt(pt) + 1))).toLong
      assert(r.getAs[Long]("w") === expect, s"pc=$pc nc=$nc")
    }
  }

  test("bitext margin product fits Long over the whole conf envelope") {
    // 2e6·k·c6 with c6 ≤ 1e6 (a cosine) and the conf-required k ≤ 1e6:
    // the extreme corner is 2e18 < 2^63 — prove the edge, and that the
    // conf guard refuses k past the envelope
    val corner = BigInt(2000000) * 1000000 * 1000000
    assert(corner.isValidLong, "margin envelope corner must fit Long")
    assert(corner * 10 > BigInt(Long.MaxValue),
      "corner within 10x of the cliff — the require bound is load-bearing")
    spark.conf.set("spark.graft.bitext.k", "1000001")
    try {
      val e = intercept[IllegalArgumentException] {
        operators.Similarity.bitextMine(spark, sf)
      }
      assert(e.getMessage.contains("spark.graft.bitext.k"))
    } finally spark.conf.unset("spark.graft.bitext.k")
  }

  test("z-score core: exact inside the decimal(38) envelope, loud beyond it") {
    import spark.implicits._
    // inside: values to 1e9 cents over 1e3 events — exact vs BigInt
    val rnd = new scala.util.Random(5)
    val inside = (1 to 200).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b",
        (rnd.nextInt(2000000000) - 1000000000) / 100.0))
    val got = EventsOps.anomalyZscoreOf(
      inside.toDF("event_id", "event_type", "value"))
      .collect().map(_.getAs[Long]("event_id")).toSet
    val ref = {
      val byType = inside.groupBy(_._2)
      inside.filter { case (_, t, v) =>
        val cs = byType(t).map(x => BigInt(math.round(x._3 * 100)))
        val (n, s, q) = (BigInt(cs.size), cs.sum, cs.map(c => c * c).sum)
        val c = BigInt(math.round(v * 100))
        val dev = c * n - s
        dev * dev > 4 * (q * n - s * s)
      }.map(_._1).toSet
    }
    assert(got === ref, "z-score flags diverge from the BigInt reference")
    // beyond: |c|·n past ~1e17 cents — the guard must raise, not
    // silently under-report (decimal(38) products go NULL in non-ANSI)
    val big = (1 to 600).map(i => (i.toLong, "x", 9.0e14 + i)) :+
      (9999L, "x", -9.0e14)
    val err = intercept[Exception] {
      EventsOps.anomalyZscoreOf(big.toDF("event_id", "event_type", "value"))
        .collect()
    }
    // the raise_error text may sit anywhere in the wrapped cause chain
    val chain = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("anomalyZscore"),
      s"expected the loud overflow guard, got: $chain")
  }
}
