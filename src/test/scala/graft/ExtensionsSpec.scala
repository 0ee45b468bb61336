package graft

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

class ExtensionsSpec extends SparkFunSuite {

  test("extensions-configured session resolves engine functions in pure SQL") {
    import org.apache.spark.sql.SparkSession
    val base = spark // make sure the shared session/context exist first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // same JVM/SparkContext, fresh session WITH the extensions — the
      // path a spark.sql.extensions=graft.GraftExtensions user gets
      val s2 = SparkSession.builder()
        .master("local[4]")
        .appName("graft-ext")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val dot = s2.sql(
        """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
        .head().getDouble(0)
      assert(dot === 11.0)
      val inter = s2.sql(
        "SELECT sorted_intersect(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS n")
        .head().getLong(0)
      assert(inter === 2L)
      val shingles = s2.sql("SELECT shingle_explode('abcd', 3)").collect()
      assert(shingles.map(r => (r.getInt(0), r.getString(1))).toSeq ===
        Seq((1, "abc"), (2, "bcd")))
      // the injected optimizer rule + strategy fire on the pure-SQL
      // row_number top-k idiom too (no experimental.* mutation here)
      import org.apache.spark.sql.functions.{col, row_number}
      import org.apache.spark.sql.expressions.Window
      val topk = Tables.orders(s2, sf)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .filter(col("rn") <= 2).drop("rn")
      assert(topk.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
        "extensions session did not plan the window idiom via TopKPerGroupExec")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("shingle_explode counts code points and rejects a NULL width") {
    graft.functions.ShingleExplode.register(spark)
    // "a😀b" is 3 characters but 4 UTF-16 units: code-point iteration must
    // yield 2 bigram shingles and never split the surrogate pair
    val rows = spark.sql("SELECT shingle_explode('a😀b', 2)").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ===
      Seq((1, "a😀"), (2, "😀b")))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT shingle_explode('abc', CAST(NULL AS INT))").collect()
    }
    assert(err.getMessage.contains("width must not be NULL"))
  }

  test("typed Aggregator registers as a plain SQL UDAF (spark.udf.register)") {
    val s = spark
    import s.implicits._
    // the everyday registration surface: the same typed Aggregator the
    // Dataset path uses, exposed to SQL users as a named aggregate
    s.udf.register("minhash_sig",
      org.apache.spark.sql.functions.udaf(graft.functions.MinHashAggregator))
    Tables.documents(s, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.expr("array_distinct(split(text, ' '))")).as("t"))
      .createOrReplaceTempView("t_udaf_tokens")
    val viaSql = s.sql(
      """SELECT doc_id, minhash_sig(doc_id, t) AS sig_csv
        |FROM t_udaf_tokens GROUP BY doc_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaTyped = graft.operators.Dedup.minhashUdaf(s, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaSql === viaTyped)
  }

  test("observe() meters a pipeline without a second pass") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    // at 100 TB you can't afford a separate count/sum job just to know
    // what a stage saw — observe() piggybacks named aggregates on the
    // one real pass and surfaces them post-action
    val observation = new org.apache.spark.sql.Observation("scan_stats")
    val df = Tables.lineitem(spark, sf)
      .observe(observation, count(lit(1)).as("rows_seen"),
        sum(col("l_quantity")).as("qty_seen"))
      .filter(col("l_quantity") > 25)
    val kept = df.count()
    val obs = observation.get
    val rowsSeen = obs("rows_seen").asInstanceOf[Long]
    assert(rowsSeen === Tables.lineitem(spark, sf).count())
    assert(kept < rowsSeen) // the metric saw pre-filter traffic
    assert(obs("qty_seen").asInstanceOf[Double] > 0.0)
  }

  test("text stats: counts are consistent and positive") {
    val rows = TextAnalysis.textStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") > 0)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_tokens"))
      val ttr = r.getAs[Double]("ttr")
      assert(ttr > 0 && ttr <= 1.0)
    }
  }

  test("fingerprints are deterministic across runs") {
    val a = TextAnalysis.fingerprint(spark, sf).collect().map(_.toSeq)
    val b = TextAnalysis.fingerprint(spark, sf).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("winnowing equals a from-scratch rightmost-min selection at sf0.001") {
    // independent reference: own MD5, own window scan, own tie rule
    def hash24(sr: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(sr.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16)
    }
    val (k, w) = (5, 8)
    val expected = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .flatMap { r =>
        val toks = r.getString(1).split(' ')
        val gh = toks.sliding(k).filter(_.length == k)
          .map(g => hash24(g.mkString(" "))).toArray
        val m = gh.length
        if (m == 0) Nil
        else {
          val wEff = math.min(w, m)
          (0 to math.max(m - w, 0)).flatMap { j =>
            val win = gh.slice(j, j + wEff)
            val mn = win.min
            Some(j + win.lastIndexOf(mn)) // rightmost min, 0-based
          }.distinct.sorted.map(p => (r.getLong(0), (p + 1).toLong, gh(p)))
        }
      }.toSeq
    val got = TextAnalysis.winnowFingerprints(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected.sortBy(t => (t._1, t._2)))
  }

  test("winnowing guarantee: a shared w+k-1 token run always shares a fingerprint") {
    val s = spark
    import s.implicits._
    // 12 shared tokens (w+k-1) embedded in otherwise-disjoint text
    val shared = (1 to 12).map(i => s"sh$i").mkString(" ")
    val frame = Seq(
      10L -> s"ax1 ax2 ax3 ax4 ax5 ax6 $shared ax7 ax8",
      20L -> s"bx1 $shared bx2 bx3 bx4 bx5 bx6 bx7 bx8 bx9"
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowSelectedOf(spark, frame)
      .select("doc_id", "fp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(10L) & fps(20L)).nonEmpty,
      "a 12-token shared run must be caught by at least one shared fingerprint")
  }

  test("minhash candidates respect the est-jaccard post-filter") {
    val rows = Dedup.dedupMinhash(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("matches") >= 6)
      assert(r.getAs[Long]("d1") < r.getAs[Long]("d2"))
      assert(r.getAs[Double]("est_jaccard") >= 0.75)
    }
  }

  test("simhash: 32-bit signature per document") {
    val rows = Dedup.dedupSimhash(spark, sf).collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    assert(rows.forall(_.getAs[String]("simhash").matches("[01]{32}")))
  }

  test("ngram jaccard bounded to (0.6, 1]") {
    val rows = Dedup.dedupNgram(spark, sf).collect()
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.6 && j <= 1.0)
    }
  }

  test("knn: 5 neighbors per query, cosine in [-1,1], ranks ordered") {
    val rows = Similarity.knnBrute(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size === 20)
    byQ.values.foreach { g =>
      assert(g.length === 5)
      val sims = g.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("sim"))
      assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)))
      assert(sims.forall(v => v >= -1.0 && v <= 1.0))
    }
  }

  test("lsh knn only pairs vectors from the same bucket") {
    val rows = Similarity.knnLsh(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("bucket").matches("[01]{4}")))
  }

  test("multimodal decode: checksum matches payload, metadata deterministic") {
    val rows = Multimodal.multimodalDecode(spark, sf).collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[String]("checksum").matches("[0-9a-f]{32}"))
      assert(r.getAs[Long]("n_bytes") > 0)
      if (r.getAs[String]("modality") == "image")
        assert(r.getAs[Long]("duration_ms") === 0L)
    }
  }
}
