package graft.operators

import graft.CacheScope
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators — the step between curation (dedup/quality/
  * sampling, elsewhere in this package) and the trainer: chunking long
  * documents into model-window pieces, packing documents into fixed
  * token-budget training sequences, and building a token inverted index
  * for corpus inspection. All three are shaped for 100 TB first:
  * chunking is a pure per-row generator (scan speed, no shuffle),
  * packing is shard-parallel (a window over `doc_id % SHARDS`, never a
  * global order), and the index bounds its posting lists through the
  * custom top-k operator instead of an unbounded `collect_set`.
  */
object Corpus {

  /** Tunables, read per call with `spark.graft.*` session confs. The
    * DuckDB oracles pin the DEFAULTS — non-default values are user
    * surface (the plan shape is identical at any setting). */
  private def confInt(s: SparkSession, key: String, dflt: Int): Int =
    graft.GraftConf.int(s, key, dflt)

  private def confDouble(s: SparkSession, key: String, dflt: Double): Double =
    graft.GraftConf.double(s, key, dflt)

  /** Sliding-window chunker: WINDOW=64 tokens, STRIDE=48 (16-token
    * overlap) — the RAG/pretraining chunk shape. Chunk i of a doc covers
    * tokens [i·48+1, min(i·48+64, n)]; starts run while i·48 < n, so every
    * token lands in ≥1 chunk and a doc shorter than one window yields
    * exactly one chunk. Pure per-row arithmetic + explode: at 100 TB this
    * is scan → generate → write, no exchange anywhere. */
  def textChunks(s: SparkSession, d: String): DataFrame = {
    val win = confInt(s, "spark.graft.corpus.chunkWindow", 64)
    val stride = confInt(s, "spark.graft.corpus.chunkStride", 48)
    require(stride > 0 && win >= stride,
      s"chunkWindow ($win) must be >= chunkStride ($stride) > 0")
    documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("chunk_id",
        explode(expr(s"sequence(0, CAST(ceil(n / $stride.0) AS INT) - 1)")))
      .select(
        col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id") * stride + 1).cast("long").as("tok_start"),
        least(col("chunk_id") * stride + win, col("n")).cast("long").as("tok_end"),
        expr(s"array_join(slice(toks, chunk_id * $stride + 1, $win), ' ')").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Sequence packing: assign whole documents to fixed token-budget
    * training sequences (BUDGET=512) by greedy sequential fill inside a
    * shard. `bin = (running_token_count − n_tokens) DIV budget` — a doc
    * goes to the bin where its start offset lands, so a bin overflows by
    * at most its last doc (the standard don't-split-documents packer
    * trade; the fill stats expose it). Sharding (`doc_id % 8`) is what
    * makes this scale: the window runs per shard in parallel — there is
    * NO global-order cumsum, which at 100 TB would serialize on one
    * partition. More shards = more parallelism, same semantics. */
  def seqPack(s: SparkSession, d: String): DataFrame = {
    val budget = confInt(s, "spark.graft.corpus.packBudget", 512)
    val shards = confInt(s, "spark.graft.corpus.packShards", 8)
    require(budget > 0 && shards > 0, "packBudget and packShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.Tables.widen(documents(s, d))
      .select(col("doc_id"), (col("doc_id") % shards).as("shard"),
        expr("size(split(text, ' '))").cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", ((col("cum") - col("n_tokens")) / budget).cast("long"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .select(col("shard"), col("bin"), col("n_docs"),
        col("seq_tokens").cast("long").as("seq_tokens"),
        col("first_doc"), col("last_doc"))
      .orderBy(col("shard"), col("bin"))
  }

  /** Content-defined chunking (the LBFS/rsync rolling-hash family,
    * Muthitacharoen et al. 2001): chunk boundaries are cut where a hash
    * of the local token window hits a divisor, so IDENTICAL text spans
    * produce IDENTICAL chunks no matter where they sit in a document —
    * the property fixed-stride chunking ([[textChunks]]) lacks, and the
    * reason dedup stores and chunk-granular corpus dedup use CDC: an
    * edit resynchronizes within one window instead of shifting every
    * downstream boundary.
    *
    * The hash is INTEGER end-to-end (the engine's md5-prefix idiom): a
    * token's value is its 24-bit md5 prefix, a window of 4 tokens mixes
    * as `h0 + 3·h1 + 9·h2 + 27·h3`, and a boundary falls after the
    * window when that sum ≡ 0 mod `spark.graft.corpus.cdcDivisor`
    * (default 16, oracle-pinned — the expected-chunk-length dial; the
    * tiny fixture vocab makes observed chunks shorter than 1/p, which
    * is a fixture artifact, not an algebra property). Docs shorter than
    * one window are a single chunk, and the final token always closes
    * the last chunk.
    *
    * Scale shape: boundary detection, cut assembly, and chunk slicing
    * are ONE per-row projection of higher-order functions — scan →
    * generate, no exchange anywhere (the [[textChunks]] plan, with
    * content-defined cuts). Only [[cdcDedup]]'s hash groupBy exchanges,
    * and that input is chunk-rows, partial-aggregated map-side. */
  private def cdcRows(s: SparkSession, d: String): DataFrame =
    cdcRowsOf(s, graft.Tables.widen(documents(s, d)))

  /** [[cdcRows]] over any (doc_id, text) frame — the unit the property
    * suite drives (edit-resynchronization on synthetic documents). */
  private[graft] def cdcRowsOf(s: SparkSession, docs: DataFrame): DataFrame = {
    val div = confInt(s, "spark.graft.corpus.cdcDivisor", 16)
    require(div >= 2, "cdcDivisor must be >= 2")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("hs",
        expr("transform(toks, w -> cast(conv(substr(md5(w), 1, 6), 16, 10) as bigint))"))
      .withColumn("bnds", expr(
        s"""CASE WHEN n >= 4 THEN
           |  filter(transform(sequence(0, n - 4), i ->
           |    IF((element_at(hs, i + 1) + 3 * element_at(hs, i + 2)
           |        + 9 * element_at(hs, i + 3) + 27 * element_at(hs, i + 4))
           |          % $div = 0,
           |       i + 3, -1)), x -> x >= 0)
           |ELSE cast(array() as array<int>) END""".stripMargin))
      // the last token closes the final chunk; guard the case where it
      // is ALREADY a content boundary (no empty trailing chunk)
      .withColumn("cuts", expr(
        "IF(size(bnds) > 0 AND element_at(bnds, size(bnds)) = n - 1, " +
          "bnds, concat(bnds, array(n - 1)))"))
      .select(col("doc_id"), col("toks"), explode(expr(
        """transform(sequence(0, size(cuts) - 1), j -> named_struct(
          |  'cid', j,
          |  's', IF(j = 0, 0, element_at(cuts, j) + 1),
          |  'e', element_at(cuts, j + 1)))""".stripMargin)).as("u"))
      .select(col("doc_id"),
        col("u.cid").cast("long").as("chunk_id"),
        col("u.s").cast("long").as("tok_start"),
        (col("u.e") - col("u.s") + 1).cast("long").as("n_toks"),
        expr("array_join(slice(toks, u.s + 1, u.e - u.s + 1), ' ')").as("chunk_text"))
  }

  /** Catalog face: every CDC chunk with its 0-based token span. */
  def cdcChunks(s: SparkSession, d: String): DataFrame =
    cdcRows(s, d).orderBy(col("doc_id"), col("chunk_id"))

  /** Chunk-granular dedup over the CDC chunks: content chunks appearing
    * in ≥ 2 documents — what a dedup store would keep once and what
    * chunk-level corpus dedup (the span-dedup family at CDC granularity)
    * would rewrite. One content-keyed hash groupBy; counts partial-agg
    * map-side, no window. */
  def cdcDedup(s: SparkSession, d: String): DataFrame =
    cdcRows(s, d)
      .groupBy(md5(col("chunk_text")).as("chunk_hash"))
      .agg(count(lit(1)).as("n_occ"),
        count_distinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        min(col("n_toks")).as("n_toks"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("chunk_hash"))

  /** Token inverted index with BOUNDED posting lists: term/document
    * frequencies by hash aggregation (map-side partials), plus the 10
    * lowest doc_ids per token as a posting sample — selected by
    * [[graft.plans.TopKPerGroupOp]] (O(k) heap per token), NOT by
    * `collect_set` + sort, whose per-token state for a stopword at 100 TB
    * is the whole corpus. A production index writes full postings
    * bucketed-by-token; the stats + bounded-sample shape here is the
    * inspection/debug surface of that build. */
  def invertedIndex(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val stats = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
    val perDoc = toks.distinct()
      .withColumn("nscore", -col("doc_id").cast("double"))
    val sample = graft.plans.TopKPerGroupOp
      .topK(perDoc, "token", "nscore", "doc_id", 10)
      .groupBy(col("token"))
      .agg(array_join(sort_array(collect_list(col("doc_id"))), ",").as("postings_sample"))
    stats.join(sample, "token")
      .select(col("token"), col("tf"), col("df"), col("postings_sample"))
      .orderBy(col("token"))
  }

  /** Eval-set contamination check: flag training documents that share any
    * word 3-gram with a held-out eval set — the benchmark-leak gate every
    * serious pretraining pipeline runs before training. Eval membership is
    * `doc_id % 97 = 0` here (a stand-in for the real benchmark corpus).
    *
    * Scale shape: the eval side is small by construction (benchmarks are
    * thousands of docs, the corpus is billions), so its gram set is
    * BROADCAST — the 100 TB training side streams through a broadcast hash
    * join with no shuffle; only the per-pair overlap agg exchanges, and
    * its input is already contamination-sized, not corpus-sized. Grams are
    * md5-hashed before the join so join keys are fixed-width, not text.
    * Docs shorter than the gram width contribute no grams (guarding
    * Spark's descending `sequence(1, n<1)` footgun). Width is 3 here
    * because the synthetic corpus draws from a ~40-word vocabulary —
    * real pipelines use 8-13-gram windows, same plan. */
  def contamination(s: SparkSession, d: String): DataFrame = {
    val gw = confInt(s, "spark.graft.corpus.contaminationGram", 3)
    require(gw >= 1, "contaminationGram must be >= 1")
    def grams(df: DataFrame, idAs: String) = df
      .select(col("doc_id").as(idAs), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= gw)
      .select(col(idAs), explode(
        expr(s"transform(sequence(1, size(toks) - ${gw - 1}), i -> md5(array_join(slice(toks, i, $gw), ' ')))"))
        .as("g"))
      .distinct()
    val docs = graft.Tables.widen(documents(s, d))
    val eval = grams(docs.filter(col("doc_id") % 97 === 0), "eval_doc")
    val train = grams(docs.filter(col("doc_id") % 97 =!= 0), "train_doc")
    train.join(broadcast(eval), "g")
      .groupBy(col("train_doc"), col("eval_doc"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy(col("train_doc"), col("eval_doc"))
  }

  /** Deterministic source mixing: scale each source toward target mixture
    * weights under a global token budget — the data-mixing step that sets
    * a training corpus's domain composition. Weights here are a fixed
    * ramp over the twenty synthetic sources (src k gets (20−k)/210 of the
    * budget); the budget is `mixRatio` (default 0.5) of total corpus
    * tokens. Per-source acceptance rate = min(1, budget·w / source
    * tokens); membership is the md5-prefix hash gate (partition-invariant
    * and re-ingest-stable, like [[Sampling]]). The rate boundary is
    * compared in fixed-width HEX (hash prefix < hex13(⌊rate·2^52⌋)) so
    * both engines decide from the identical 52-bit integer — no
    * float-parse ambiguity at the boundary.
    *
    * Scale shape: per-source totals are one partial-agg exchange over
    * |sources| groups; the 20-row rate table BROADCASTS back onto the
    * scan; the keep decision is per-row; only the final per-source
    * summary exchanges again. The corpus itself never shuffles. */
  def mixSources(s: SparkSession, d: String): DataFrame = {
    val ratio = confDouble(s, "spark.graft.corpus.mixRatio", 0.5)
    require(ratio > 0, "mixRatio must be positive")
    val docs = documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    // The 20-row per-source stats table is persisted (CacheScope-tracked)
    // so the rate derivation AND the final summary join reuse ONE pass
    // over the corpus; the grand total derives from this same aggregate
    // via a whole-frame window (20 rows through one partition — free),
    // not a second corpus scan + 1-row cross join.
    val bySource = CacheScope.track(docs.groupBy(col("source"))
      .agg(count(lit(1)).as("src_docs"), sum(col("n_tokens")).as("src_tokens"))
      .persist())
    // mirror the oracle's arithmetic shape exactly: ((ratio·total)·w)/src;
    // sum(src_tokens) is the same exact long sum as the oracle's
    // SUM(n_tokens), cast to double once.
    val rates = bySource
      .withColumn("total_tokens", sum(col("src_tokens")).over().cast("double"))
      .withColumn("w",
        (lit(20) - substring(col("source"), 4, 8).cast("int")) / lit(210.0))
      .withColumn("rate",
        least(lit(1.0),
          lit(ratio) * col("total_tokens") * col("w") /
            col("src_tokens").cast("double")))
      .withColumn("hex_thr", lpad(lower(hex(
        floor(col("rate") * lit(4503599627370496.0)).cast("long"))), 13, "0"))
    val kept = docs.join(broadcast(rates.select(col("source"), col("rate"), col("hex_thr"))), "source")
      .filter(col("rate") >= 1.0 ||
        substring(md5(col("doc_id").cast("string")), 1, 13) < col("hex_thr"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("kept_tokens"))
    bySource.join(kept, Seq("source"), "left")
      .select(col("source"), col("src_docs"),
        col("src_tokens").cast("long").as("src_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens").cast("long"), lit(0L)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  /** Corpus-frequency boilerplate removal (the C4 move, block-granular):
    * a word block appearing in ≥ `boilerDf` DISTINCT documents is
    * boilerplate (headers, footers, license banners); documents are
    * reassembled from their surviving blocks in order. Output carries
    * md5(clean text) rather than the text — the gate compares content
    * without hauling the corpus through the result set. Block width 3 /
    * df 3 fit the synthetic 40-word vocabulary (measured: ~9% of block
    * instances strip at sf0.01); real pipelines run line- or
    * paragraph-granular with the same plan.
    *
    * Scale shape: explode is narrow; block frequencies are one hash agg;
    * the frequency join keys on the block text (at 100 TB: its fixed-width
    * hash); reassembly is one more exchange keyed by doc. Three shuffles
    * total, each over block-sized rows, never whole documents. */
  def boilerplateRm(s: SparkSession, d: String): DataFrame = {
    val w = confInt(s, "spark.graft.corpus.boilerBlock", 3)
    val minDf = confInt(s, "spark.graft.corpus.boilerDf", 3)
    require(w >= 1 && minDf >= 2, "boilerBlock >= 1, boilerDf >= 2")
    val blocks = graft.Tables.widen(documents(s, d))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("block_id",
        explode(expr(s"sequence(0, CAST(ceil(n / $w.0) AS INT) - 1)")))
      .select(col("doc_id"), col("block_id").cast("long").as("block_id"),
        expr(s"array_join(slice(toks, block_id * $w + 1, $w), ' ')").as("btxt"))
    val freq = blocks.groupBy(col("btxt"))
      .agg(count_distinct(col("doc_id")).as("df"))
    blocks.join(freq, "btxt")
      .withColumn("boiler", col("df") >= minDf)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_removed"),
        md5(array_join(
          transform(
            array_sort(collect_list(
              when(not(col("boiler")), struct(col("block_id"), col("btxt"))))),
            x => x.getField("btxt")),
          " ")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  // --------------------------------------------------------------- wiring

  /** Length-bucketed batching: group docs of similar token length into
    * fixed-size batches so each batch pads to ITS OWN max, not the
    * corpus max — the padding-efficiency move every packed-inference
    * and training loader makes. Docs are ordered by (length, id) within
    * `doc_id % 8` shards (same shard-parallel shape as [[seqPack]]: no
    * global sort), cut into 32-doc batches, and each batch reports its
    * padding waste (`32·max − Σ` tokens) — the number this layout
    * minimizes. Per-shard windows are the only exchange; at 100 TB each
    * shard sorts independently and batches stream out. */
  def lengthBatch(s: SparkSession, d: String): DataFrame = {
    val batch = confInt(s, "spark.graft.corpus.lengthBatch", 32)
    require(batch >= 1, "lengthBatch must be >= 1")
    documents(s, d)
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("n_tokens"), col("doc_id"))))
      .withColumn("batch_id", ((col("rn") - 1) / batch).cast("long"))
      .groupBy(col("shard"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"),
        (max(col("n_tokens")) * count(lit(1)) - sum(col("n_tokens")))
          .as("padding_waste"))
      .orderBy(col("shard"), col("batch_id"))
  }

  /** Cross-document LINE dedup, keep-first (the C4/CCNet line-level
    * pass, block-granular because the synthetic corpus has no newlines):
    * a width-5 word block that already appeared earlier in the corpus —
    * in a lower doc_id, or earlier in the same doc — is removed, and
    * each document is reassembled from its surviving blocks in order.
    * This is the complement of [[boilerplateRm]]: that drops blocks
    * FREQUENT across docs everywhere they appear; this keeps exactly ONE
    * global occurrence of every block. Output carries md5(clean text),
    * never the text.
    *
    * Scale shape: the global first occurrence comes from a partial-agg
    * min-struct over the block text joined back onto the block stream —
    * NOT a `row_number over (partition by btxt)` window: a "Sign in"
    * boilerplate block present in half the web lands 10¹⁰ occurrences
    * in ONE window partition AQE cannot split, while the skewed side of
    * this sort-merge join it can. Then one shuffle on doc_id to
    * reassemble. Block width 5 ≈ 30 B keys — narrower than a 32-byte
    * md5 hex, so the raw text IS the compact shuffle key. */
  def lineDedup(s: SparkSession, d: String): DataFrame = {
    val w = confInt(s, "spark.graft.corpus.lineBlock", 5)
    require(w >= 1, "lineBlock must be >= 1")
    val blocks = graft.Tables.widen(documents(s, d))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("block_id",
        explode(expr(s"sequence(0, CAST(ceil(n / $w.0) AS INT) - 1)")))
      .select(col("doc_id"), col("block_id").cast("long").as("block_id"),
        expr(s"array_join(slice(toks, block_id * $w + 1, $w), ' ')").as("btxt"))
    blocks
      .join(blocks.groupBy(col("btxt"))
        .agg(min(struct(col("doc_id"), col("block_id"))).as("first")), "btxt")
      .withColumn("is_first",
        col("doc_id") === col("first.doc_id") &&
          col("block_id") === col("first.block_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(!col("is_first"), 1L).otherwise(0L)).as("n_removed"),
        md5(array_join(
          transform(
            array_sort(collect_list(
              when(col("is_first"), struct(col("block_id"), col("btxt"))))),
            x => x.getField("btxt")),
          " ")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** Temperature-based mixture weights (the multilingual/multi-domain
    * resampling move: raise small sources, damp large ones). For each
    * source with natural share p = src_tokens/total, the α=0.5 tempered
    * share is q ∝ p^α — computed as `sqrt(p)` because IEEE sqrt is
    * correctly rounded and therefore bit-identical across engines,
    * which a libm `pow(p, α)` is NOT (the reason α is fixed rather than
    * a conf: any other α would make the oracle engine-dependent).
    * `epochs` = q·total/src_tokens is the effective pass count over each
    * source a sampler at these weights implies — the number a data-mix
    * designer actually reads (small sources > 1, large sources < 1).
    *
    * Scale shape: one partial-aggregated pass over the corpus into a
    * |sources|-row table; the normalization is two whole-frame windows
    * over those 20 rows (free); nothing corpus-sized moves. The weight
    * sum crosses engines exactly by summing 9-dp DECIMALs, not doubles
    * (double-sum order is engine-defined; decimal sums are exact). */
  def mixTemperature(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    documents(s, d)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("src_docs"), sum(col("n_tokens")).as("src_tokens"))
      // global window over the per-source AGGREGATE — ≤|sources| rows
      // (tens) through one partition, never the corpus; PlanHygieneSpec
      // allowlists exactly this bounded shape
      .withColumn("total", sum(col("src_tokens")).over().cast("double"))
      .withColumn("w", round(sqrt(col("src_tokens").cast("double") / col("total")), 9))
      .withColumn("sumw",
        sum(col("w").cast(DecimalType(12, 9))).over().cast("double"))
      .withColumn("q_temp", round(col("w") / col("sumw"), 6))
      .select(col("source"), col("src_docs"),
        col("src_tokens").cast("long").as("src_tokens"),
        round(col("src_tokens").cast("double") / col("total"), 6).as("p_natural"),
        col("q_temp"),
        round(col("q_temp") * col("total") / col("src_tokens").cast("double"), 6)
          .as("epochs"))
      .orderBy(col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_line_dedup" -> (lineDedup _),
    "q_mix_temperature" -> (mixTemperature _),
    "q_text_chunks" -> (textChunks _),
    "q_cdc_chunks" -> (cdcChunks _),
    "q_cdc_dedup" -> (cdcDedup _),
    "q_seq_pack" -> (seqPack _),
    "q_inverted_index" -> (invertedIndex _),
    "q_contamination" -> (contamination _),
    "q_mix_sources" -> (mixSources _),
    "q_boilerplate_rm" -> (boilerplateRm _),
    "q_length_batch" -> (lengthBatch _)
  )

  /** Shared by the two CDC oracles: the same 24-bit md5 token hashes,
    * window mix, boundary condition, and cut assembly — DuckDB `range`
    * is end-exclusive where Spark `sequence` is inclusive, and both
    * engines index lists 1-based. */
  private val cdcCteSql =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |h AS (
      |  SELECT doc_id, toks, len(toks) AS n,
      |    list_transform(toks, w -> ('0x' || substr(md5(w), 1, 6))::BIGINT) AS hs
      |  FROM t),
      |b AS (
      |  SELECT doc_id, toks, n,
      |    CASE WHEN n >= 4 THEN
      |      list_filter(list_transform(range(0, n - 3), i ->
      |        CASE WHEN (hs[i + 1] + 3 * hs[i + 2] + 9 * hs[i + 3]
      |                   + 27 * hs[i + 4]) % 16 = 0
      |          THEN i + 3 ELSE -1 END), x -> x >= 0)
      |    ELSE [] END AS bnds
      |  FROM h),
      |c AS (
      |  SELECT doc_id, toks, n,
      |    CASE WHEN len(bnds) > 0 AND bnds[len(bnds)] = n - 1
      |      THEN bnds ELSE list_append(bnds, n - 1) END AS cuts
      |  FROM b),
      |ch AS (
      |  SELECT doc_id, toks,
      |    unnest(list_transform(range(0, len(cuts)), j -> struct_pack(
      |      cid := j,
      |      s := CASE WHEN j = 0 THEN 0 ELSE cuts[j] + 1 END,
      |      e := cuts[j + 1]))) AS u
      |  FROM c),
      |chunks AS (
      |  SELECT doc_id, CAST(u.cid AS BIGINT) AS chunk_id,
      |    CAST(u.s AS BIGINT) AS tok_start,
      |    CAST(u.e - u.s + 1 AS BIGINT) AS n_toks,
      |    array_to_string(list_slice(toks, u.s + 1, u.e + 1), ' ') AS chunk_text
      |  FROM ch)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_cdc_chunks" ->
      s"""WITH $cdcCteSql
        |SELECT doc_id, chunk_id, tok_start, n_toks, chunk_text
        |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,

    "q_cdc_dedup" ->
      s"""WITH $cdcCteSql
        |SELECT md5(chunk_text) AS chunk_hash,
        |  CAST(COUNT(*) AS BIGINT) AS n_occ,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  MIN(doc_id) AS first_doc, MIN(n_toks) AS n_toks
        |FROM chunks GROUP BY md5(chunk_text)
        |HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY chunk_hash""".stripMargin,

    "q_line_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, toks, n,
        |    unnest(range(CAST(ceil(n / 5.0) AS BIGINT))) AS block_id
        |  FROM t),
        |x AS (
        |  SELECT doc_id, block_id,
        |    array_to_string(list_slice(toks, block_id * 5 + 1,
        |      least(block_id * 5 + 5, n)), ' ') AS btxt
        |  FROM b),
        |r AS (
        |  SELECT doc_id, block_id, btxt,
        |    ROW_NUMBER() OVER (PARTITION BY btxt ORDER BY doc_id, block_id) AS rn
        |  FROM x)
        |SELECT doc_id, COUNT(*) AS n_blocks,
        |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN btxt END, ' '
        |    ORDER BY block_id), '')) AS clean_md5
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_mix_temperature" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |s AS (
        |  SELECT source, COUNT(*) AS src_docs,
        |    CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
        |  FROM t GROUP BY source),
        |x AS (
        |  SELECT source, src_docs, src_tokens,
        |    CAST((SELECT SUM(src_tokens) FROM s) AS DOUBLE) AS total
        |  FROM s),
        |y AS (
        |  SELECT *, round(sqrt(CAST(src_tokens AS DOUBLE) / total), 9) AS w
        |  FROM x),
        |z AS (
        |  SELECT *,
        |    CAST((SELECT SUM(CAST(w AS DECIMAL(12,9))) FROM y) AS DOUBLE) AS sumw
        |  FROM y)
        |SELECT source, src_docs, src_tokens,
        |  round(CAST(src_tokens AS DOUBLE) / total, 6) AS p_natural,
        |  round(w / sumw, 6) AS q_temp,
        |  round(round(w / sumw, 6) * total / CAST(src_tokens AS DOUBLE), 6) AS epochs
        |FROM z ORDER BY source""".stripMargin,

    "q_text_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n, toks, unnest(range(CAST(ceil(n / 48.0) AS BIGINT))) AS chunk_id
        |  FROM t)
        |SELECT doc_id, chunk_id,
        |  chunk_id * 48 + 1 AS tok_start,
        |  least(chunk_id * 48 + 64, n) AS tok_end,
        |  array_to_string(list_slice(toks, chunk_id * 48 + 1,
        |    least(chunk_id * 48 + 64, n)), ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q_seq_pack" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM t)
        |SELECT shard, (cum - n_tokens) // 512 AS bin,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY shard, (cum - n_tokens) // 512
        |ORDER BY shard, bin""".stripMargin,

    "q_mix_sources" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |s AS (
        |  SELECT source, COUNT(*) AS src_docs,
        |    CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
        |  FROM t GROUP BY source),
        |r AS (
        |  SELECT source, src_docs, src_tokens,
        |    least(CAST(1.0 AS DOUBLE),
        |      CAST(0.5 AS DOUBLE) * (SELECT CAST(SUM(n_tokens) AS DOUBLE) FROM t)
        |        * ((20 - CAST(substr(source, 4) AS INT)) / CAST(210.0 AS DOUBLE))
        |        / CAST(src_tokens AS DOUBLE)) AS rate
        |  FROM s),
        |k AS (
        |  SELECT t.source, t.n_tokens FROM t JOIN r USING (source)
        |  WHERE r.rate >= 1.0
        |     OR substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 13)
        |        < printf('%013x', CAST(floor(r.rate * CAST(4503599627370496 AS DOUBLE)) AS BIGINT))),
        |a AS (
        |  SELECT source, COUNT(*) AS n_kept,
        |    CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
        |  FROM k GROUP BY source)
        |SELECT r.source, r.src_docs, r.src_tokens,
        |  COALESCE(a.n_kept, 0) AS n_kept,
        |  COALESCE(a.kept_tokens, 0) AS kept_tokens
        |FROM r LEFT JOIN a USING (source) ORDER BY r.source""".stripMargin,

    "q_boilerplate_rm" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, toks, n,
        |    unnest(range(CAST(ceil(n / 3.0) AS BIGINT))) AS block_id
        |  FROM t),
        |x AS (
        |  SELECT doc_id, block_id,
        |    array_to_string(list_slice(toks, block_id * 3 + 1,
        |      least(block_id * 3 + 3, n)), ' ') AS btxt
        |  FROM b),
        |f AS (SELECT btxt, COUNT(DISTINCT doc_id) AS df FROM x GROUP BY btxt)
        |SELECT x.doc_id, COUNT(*) AS n_blocks,
        |  CAST(SUM(CASE WHEN f.df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  md5(COALESCE(string_agg(CASE WHEN f.df < 3 THEN x.btxt END, ' '
        |    ORDER BY x.block_id), '')) AS clean_md5
        |FROM x JOIN f USING (btxt)
        |GROUP BY x.doc_id ORDER BY x.doc_id""".stripMargin,

    "q_length_batch" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT shard, doc_id, n_tokens,
        |    ROW_NUMBER() OVER (PARTITION BY shard
        |      ORDER BY n_tokens, doc_id) AS rn
        |  FROM t)
        |SELECT shard, (rn - 1) // 32 AS batch_id,
        |  COUNT(*) AS n_docs,
        |  MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens,
        |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        |  MAX(n_tokens) * COUNT(*) - CAST(SUM(n_tokens) AS BIGINT) AS padding_waste
        |FROM r GROUP BY shard, (rn - 1) // 32
        |ORDER BY shard, batch_id""".stripMargin,

    "q_contamination" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |ix AS (
        |  SELECT doc_id, toks, unnest(range(1, n - 1)) AS i
        |  FROM t WHERE n >= 3),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |    md5(array_to_string(list_slice(toks, i, i + 2), ' ')) AS g
        |  FROM ix),
        |e AS (SELECT doc_id AS eval_doc, g FROM g WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id AS train_doc, g FROM g WHERE doc_id % 97 <> 0)
        |SELECT tr.train_doc, e.eval_doc, COUNT(*) AS n_shared_grams
        |FROM tr JOIN e ON tr.g = e.g
        |GROUP BY tr.train_doc, e.eval_doc
        |ORDER BY tr.train_doc, e.eval_doc""".stripMargin,

    "q_inverted_index" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |s AS (
        |  SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        |  FROM t GROUP BY token),
        |d AS (SELECT DISTINCT token, doc_id FROM t),
        |r AS (
        |  SELECT token, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn
        |  FROM d),
        |p AS (
        |  SELECT token, array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings_sample
        |  FROM r WHERE rn <= 10 GROUP BY token)
        |SELECT s.token, CAST(s.tf AS BIGINT) AS tf, CAST(s.df AS BIGINT) AS df,
        |  p.postings_sample
        |FROM s JOIN p ON s.token = p.token
        |ORDER BY s.token""".stripMargin
  )
}
