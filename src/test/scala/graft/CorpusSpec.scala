package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Corpus-assembly invariants the oracle's value-compare can't state
  * directly: chunk coverage/overlap and packing conservation. */
class CorpusSpec extends SparkFunSuite {

  test("chunker covers every token, strides at 48, chunk length matches span") {
    val chunks = Corpus.textChunks(spark, sf)
      .withColumn("n_chunk_toks", size(split(col("chunk_text"), " ")).cast("long"))
      .collect()
    assert(chunks.nonEmpty)
    chunks.foreach { r =>
      assert(r.getAs[Long]("tok_start") === r.getAs[Long]("chunk_id") * 48 + 1)
      assert(r.getAs[Long]("n_chunk_toks") ===
        r.getAs[Long]("tok_end") - r.getAs[Long]("tok_start") + 1)
    }
    // last chunk of every doc ends exactly at the doc's token count
    val docTokens = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), expr("size(split(text, ' '))").cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    chunks.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, cs) =>
      assert(cs.map(_.getAs[Long]("tok_end")).max === docTokens(id),
        s"doc $id: tail tokens uncovered")
    }
  }

  test("spark.graft.* confs retune the operators; defaults match the oracle constants") {
    val s = spark
    try {
      s.conf.set("spark.graft.corpus.chunkWindow", "32")
      s.conf.set("spark.graft.corpus.chunkStride", "16")
      val tuned = Corpus.textChunks(s, sf).count()
      s.conf.unset("spark.graft.corpus.chunkWindow")
      s.conf.unset("spark.graft.corpus.chunkStride")
      val dflt = Corpus.textChunks(s, sf).count()
      assert(tuned > dflt, s"stride 16 must yield more chunks than 48 ($tuned vs $dflt)")

      s.conf.set("spark.graft.sampling.stratumK", "5")
      val k5 = operators.Sampling.sampleStratified(s, sf).count()
      s.conf.unset("spark.graft.sampling.stratumK")
      val k20 = operators.Sampling.sampleStratified(s, sf).count()
      assert(k5 === k20 / 4, s"stratumK=5 should quarter the sample ($k5 vs $k20)")

      s.conf.set("spark.graft.ivf.nprobe", "1")
      val probe1 = operators.Similarity.knnIvf(s, sf).count()
      s.conf.unset("spark.graft.ivf.nprobe")
      val probe2 = operators.Similarity.knnIvf(s, sf).count()
      assert(probe1 <= probe2, "nprobe=1 cannot return more neighbors than nprobe=2")
    } finally {
      Seq("spark.graft.corpus.chunkWindow", "spark.graft.corpus.chunkStride",
        "spark.graft.sampling.stratumK", "spark.graft.ivf.nprobe")
        .foreach(s.conf.unset)
      CacheScope.releaseAll()
    }
  }

  test("mix: budget scales kept tokens, rates never overshoot a source") {
    val s = spark
    val rows = Corpus.mixSources(s, sf).collect()
    assert(rows.length === 20, "one row per source")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("src_docs"))
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("src_tokens"))
    }
    val kept = rows.map(_.getAs[Long]("kept_tokens")).sum
    val total = rows.map(_.getAs[Long]("src_tokens")).sum
    // hash sampling is approximate; the corpus-level take should land in
    // the budget's neighborhood, and a tighter budget must keep less
    assert(kept > 0 && kept < total)
    try {
      s.conf.set("spark.graft.corpus.mixRatio", "0.1")
      val tight = Corpus.mixSources(s, sf).collect()
        .map(_.getAs[Long]("kept_tokens")).sum
      assert(tight < kept, s"ratio 0.1 kept $tight, ratio 0.5 kept $kept")
    } finally s.conf.unset("spark.graft.corpus.mixRatio")
    // the weight ramp means low-index sources keep a larger fraction
    val fracOf = rows.map(r => r.getAs[String]("source") ->
      r.getAs[Long]("kept_tokens").toDouble / r.getAs[Long]("src_tokens")).toMap
    assert(fracOf("src0") > fracOf("src19"),
      s"src0 should outkeep src19: $fracOf")
  }

  test("boilerplate: removed blocks are exactly the df>=3 ones, text reassembles in order") {
    val s = spark
    import org.apache.spark.sql.functions.{col, countDistinct}
    val out = Corpus.boilerplateRm(s, sf).collect()
    val docs = graft.Tables.documents(s, sf).count()
    assert(out.length === docs, "every document must survive with a row")
    val removed = out.map(_.getAs[Long]("n_removed")).sum
    val blocks = out.map(_.getAs[Long]("n_blocks")).sum
    assert(removed > 0 && removed < blocks,
      s"expected partial removal, got $removed of $blocks")
    // a doc whose every block survives must reassemble to its own text
    val clean = graft.Tables.documents(s, sf)
      .select(col("doc_id"), org.apache.spark.sql.functions.md5(col("text")).as("orig_md5"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filter(_.getAs[Long]("n_removed") == 0).take(20).foreach { r =>
      assert(r.getAs[String]("clean_md5") === clean(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}: untouched doc must round-trip")
    }
  }

  test("length batching: conserves docs/tokens, beats arrival-order padding") {
    val batched = Corpus.lengthBatch(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), expr("size(split(text, ' '))").cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(batched.map(_.getAs[Long]("n_docs")).sum === docs.length.toLong)
    assert(batched.map(_.getAs[Long]("sum_tokens")).sum === docs.map(_._2).sum)
    val sortedWaste = batched.map(_.getAs[Long]("padding_waste")).sum
    // the same shard/batch cut applied in ARRIVAL (doc_id) order — what a
    // naive loader pads to
    val naiveWaste = docs.groupBy(_._1 % 8).values.map { shard =>
      shard.sortBy(_._1).map(_._2).grouped(32)
        .map(b => b.max * b.length - b.sum).sum
    }.sum
    info(s"padding waste: length-sorted=$sortedWaste, arrival-order=$naiveWaste")
    assert(sortedWaste < naiveWaste,
      s"length bucketing should beat arrival order: $sortedWaste >= $naiveWaste")
  }

  test("packer conserves tokens and keeps bins dense per shard") {
    val packed = Corpus.seqPack(spark, sf).collect()
    val total = graft.Tables.documents(spark, sf)
      .agg(sum(expr("size(split(text, ' '))"))).head().getLong(0)
    assert(packed.map(_.getAs[Long]("seq_tokens")).sum === total,
      "packing lost or duplicated tokens")
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (shard, bins) =>
      val ids = bins.map(_.getAs[Long]("bin")).sorted
      assert(ids === (0L until ids.length).toArray.toSeq.toArray,
        s"shard $shard: bin ids not dense: ${ids.mkString(",")}")
    }
  }

  test("line dedup keeps exactly one global occurrence of every block") {
    val out = Corpus.lineDedup(spark, sf).collect()
    val blockStats = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("block_id",
        explode(expr("sequence(0, CAST(ceil(n / 5.0) AS INT) - 1)")))
      .select(expr("array_join(slice(toks, block_id * 5 + 1, 5), ' ')").as("btxt"))
    val totalBlocks = blockStats.count()
    val distinctBlocks = blockStats.distinct().count()
    assert(out.map(_.getAs[Long]("n_blocks")).sum === totalBlocks)
    // every duplicate occurrence beyond the first is removed, corpus-wide
    assert(out.map(_.getAs[Long]("n_removed")).sum === totalBlocks - distinctBlocks)
    assert(totalBlocks > distinctBlocks,
      "fixture has no duplicate blocks — test vacuous")
  }

  test("temperature mixing: α=0.5 shares normalize and flatten the natural mix") {
    val rows = Corpus.mixTemperature(spark, sf).collect()
    assert(rows.length > 1)
    assert(math.abs(rows.map(_.getAs[Double]("q_temp")).sum - 1.0) < 1e-4,
      "tempered shares must sum to 1")
    // tempering flattens but preserves order: q ∝ √p keeps the ranking
    // and shrinks the max/min spread to its square root; epochs ∝ 1/√p
    // are anti-monotone in source size
    val bySize = rows.sortBy(_.getAs[Long]("src_tokens"))
    val qBySize = bySize.map(_.getAs[Double]("q_temp"))
    assert(qBySize.zip(qBySize.tail).forall { case (a, b) => a <= b + 1e-9 },
      s"tempered shares must preserve the size ranking: ${qBySize.mkString(",")}")
    val ps = rows.map(_.getAs[Double]("p_natural"))
    val qs = rows.map(_.getAs[Double]("q_temp"))
    assert(qs.max / qs.min < ps.max / ps.min,
      s"tempering must shrink the spread: q ${qs.max / qs.min} vs p ${ps.max / ps.min}")
    val epochs = bySize.map(_.getAs[Double]("epochs"))
    assert(epochs.zip(epochs.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"epochs not anti-monotone in size: ${epochs.mkString(",")}")
  }

  // ------------------------------------------------- content-defined chunking

  test("CDC chunks partition every document exactly: spans contiguous, text rebuilds") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = Corpus.cdcChunks(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("n_toks"),
        r.getAs[String]("chunk_text")))
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2) === (0L until sorted.size).toArray, s"doc $id chunk ids")
      // contiguous spans starting at 0
      sorted.foldLeft(0L) { case (expectStart, (_, _, s0, n, _)) =>
        assert(s0 === expectStart, s"doc $id gap at $s0"); s0 + n
      }
      // concatenation rebuilds the document verbatim
      assert(sorted.map(_._5).mkString(" ") === docs(id), s"doc $id text drift")
    }
  }

  test("CDC resynchronizes after a prefix edit (the property stride chunking lacks)") {
    val s = spark
    import s.implicits._
    val text = Tables.documents(spark, sf)
      .orderBy(col("doc_id")).limit(1).selectExpr("text").collect()(0).getString(0)
    val frame = Seq(0L -> text, 1L -> ("zz9 zz8 zz7 " + text)).toDF("doc_id", "text")
    val byDoc = Corpus.cdcRowsOf(spark, frame).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("chunk_text"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // every original chunk past the first window must reappear verbatim
    // in the edited doc's chunk set — boundaries depend only on local
    // content, so a 3-token prefix edit cannot shift them
    val stable = byDoc(0L).filterNot(c => text.startsWith(c))
    assert(stable.nonEmpty, "fixture doc produced no post-prefix chunks")
    val missing = stable -- byDoc(1L)
    assert(missing.isEmpty,
      s"prefix edit shifted ${missing.size} downstream boundaries: $missing")
  }

  test("CDC invariants hold on seeded-random corpora (vocab 2/5/50, len 1..40)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    for (vocab <- Seq(2, 5, 50)) {
      val words = (0 until vocab).map(v => s"w$v")
      val frame = (0L until 60L).map { id =>
        val n = 1 + rnd.nextInt(40)
        id -> Seq.fill(n)(words(rnd.nextInt(vocab))).mkString(" ")
      }
      val texts = frame.toMap
      val chunks = Corpus.cdcRowsOf(spark, frame.toDF("doc_id", "text")).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
          r.getAs[Long]("tok_start"), r.getAs[Long]("n_toks"),
          r.getAs[String]("chunk_text")))
      assert(chunks.map(_._1).toSet === frame.map(_._1).toSet,
        s"vocab $vocab: every doc must chunk, even length-1")
      chunks.groupBy(_._1).foreach { case (id, cs) =>
        val sorted = cs.sortBy(_._2)
        sorted.foldLeft(0L) { case (expect, (_, _, st, n, _)) =>
          assert(st === expect, s"vocab $vocab doc $id: gap/overlap at $st")
          assert(n >= 1, "empty chunk")
          st + n
        }
        assert(sorted.map(_._5).mkString(" ") === texts(id),
          s"vocab $vocab doc $id: rebuild drift")
      }
    }
  }

  test("cdcDivisor is a real dial: a larger divisor cuts fewer, longer chunks") {
    val base = Corpus.cdcChunks(spark, sf).count()
    spark.conf.set("spark.graft.corpus.cdcDivisor", "64")
    try {
      val coarse = Corpus.cdcChunks(spark, sf).count()
      assert(coarse < base, s"divisor 64 not coarser: $coarse vs $base")
    } finally spark.conf.unset("spark.graft.corpus.cdcDivisor")
  }
}
