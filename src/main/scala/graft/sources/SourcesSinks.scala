package graft.sources

import graft.Exact.dec
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink matrix beyond parquet: CSV, JSON, and line-text round
  * trips, plus the binaryFile blob source.
  *
  * The reference's sources/sinks are text files and S3 objects moved
  * whole (SURVEY.md O1-O6, O18, O24); in Spark every format below is the
  * same `spark.read`/`df.write` surface over any Hadoop filesystem —
  * s3a:// at scale, local tmp here. Each round-trip query WRITES with the
  * engine and READS back with the engine, then aggregates; the oracle
  * checks the result against the original table, so a lossy
  * serialization round trip would fail the gate.
  */
object SourcesSinks {

  private def stage(sub: String): String = {
    val p = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_sink_stage", sub)
    p.toString
  }

  /** CSV sink → CSV source (schema-ful, header) → aggregate. */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = stage(s"csv_${math.abs(d.hashCode)}")
    nation(s, d).write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    s.read.option("header", "true").schema(schema).csv(out)
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"),
        min(col("n_name")).as("first_name"))
      .select(col("n_regionkey").cast("long").as("regionkey"),
        col("n_nations"), col("first_name"))
      .orderBy(col("regionkey"))
  }

  /** JSON sink → JSON source → aggregate (timestamps carried as epoch ms). */
  def jsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = stage(s"json_${math.abs(d.hashCode)}")
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_date_ms"),
        col("o_orderstatus"))
      .write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType),
      StructField("o_date_ms", LongType),
      StructField("o_orderstatus", StringType)))
    s.read.schema(schema).json(out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"), 12, 2)).cast("double").as("total"),
        min(col("o_date_ms")).as("first_date_ms"))
      .orderBy(col("o_orderstatus"))
  }

  /** ORC sink → ORC source: the second columnar format (built into
    * Spark), same predicate-pushdown/column-pruning story as parquet —
    * the round trip proves schema + values survive the other columnar
    * container. */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = stage(s"orc_${math.abs(d.hashCode)}")
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      .write.mode("overwrite").orc(out)
    s.read.orc(out)
      .filter(col("l_quantity") > 25) // pushed into the ORC scan
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"), 12, 2)).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** XML sink → XML source (Spark 4 ships the XML data source in core):
    * region written as `<row>` elements, read back with an explicit
    * schema and re-aggregated — the document-ish interchange format the
    * reference's HTML-report world would actually meet. */
  def xmlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = stage(s"xml_${math.abs(d.hashCode)}")
    region(s, d).write.mode("overwrite")
      .option("rowTag", "row").format("xml").save(out)
    val schema = StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType)))
    s.read.option("rowTag", "row").schema(schema).format("xml").load(out)
      .agg(count(lit(1)).as("n_regions"),
        min(col("r_name")).as("first_region"),
        sum(col("r_regionkey")).cast("long").as("key_sum"))
  }

  /** PERMISSIVE-mode JSON with a corrupt-record column: the source-layer
    * twin of the engine's error-as-value rows (reference O16 — a worker
    * never drops a failing task, it emits an Error row; Workers.java:187,
    * 216-219). Malformed lines land in `_corrupt_record` instead of
    * killing the scan or silently vanishing — at 100 TB a bad shard is
    * data to quarantine, not a job failure. The staged file corrupts
    * every 5th nation row deterministically (garbage prefix → invalid
    * JSON; note the lenient CSV reader only NULLs unparseable values, so
    * JSON is the format whose corruption semantics are unambiguous). The
    * good rows' min name proves parsed values survive alongside the
    * quarantined ones. */
  def corruptSource(s: SparkSession, d: String): DataFrame = {
    val out = stage(s"corrupt_${math.abs(d.hashCode)}")
    nation(s, d)
      .select(concat(
        when(col("n_nationkey") % 5 === 0, lit("###")).otherwise(lit("")),
        to_json(struct(col("n_nationkey"), col("n_name"), col("n_regionkey"))))
        .as("value"))
      .repartition(1).sortWithinPartitions(col("value"))
      .write.mode("overwrite").text(out)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType),
      StructField("_corrupt_record", StringType)))
    // cache() is REQUIRED, not an optimization: a pruned consumer (e.g.
    // count()) can reduce the referenced columns to _corrupt_record
    // alone, which Spark disallows straight off a raw JSON scan
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    // documented remedy is caching the parsed result. Freed by the
    // callers' per-query clearCache.
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(out)
      .cache()
      .select(col("n_name"), col("_corrupt_record").isNotNull.as("is_corrupt"))
      .groupBy(col("is_corrupt"))
      .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name"))
      .orderBy(col("is_corrupt"))
  }

  /** Line-text sink → line-text source: the reference's native format
    * (result file, one row per line — Manager.java:287-312). Writes the
    * parity result rows as text, reads them back, re-tokenizes, and
    * re-derives the gather accounting. */
  def textRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = stage(s"text_${math.abs(d.hashCode)}")
    graft.operators.Parity.pipeline(s, d)
      .select(col("result_row"))
      .write.mode("overwrite").text(out)
    s.read.text(out)
      .select(split(col("value"), "\t").getItem(0).as("op_colon"),
        (split(col("value"), "\t").getItem(2).startsWith("Error:")).as("is_error"))
      .groupBy(col("op_colon"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_error"), 1L).otherwise(0L)).as("n_errors"))
      .orderBy(col("op_colon"))
  }

  /** Blob source (O2/O4 analog): binaryFile over a staged text file —
    * path/length metadata + content available as a binary column. The
    * stage is written as ONE file in doc order, so the blob's exact bytes
    * (and therefore md5/length) are derivable from the source table and
    * the oracle checks content, not just row counts. (The single-file
    * coalesce is the test harness making bytes deterministic, not the
    * scale path — binaryFile itself shards per file.) */
  def binarySource(s: SparkSession, d: String): DataFrame = {
    val out = stage(s"binary_${math.abs(d.hashCode)}")
    graft.operators.Parity.pipeline(s, d)
      .repartition(1).sortWithinPartitions(col("doc_id"))
      .select(col("result_row")).write.mode("overwrite").text(out)
    s.read.format("binaryFile").load(out)
      .agg(count(lit(1)).as("n_files"),
        sum(col("length")).as("total_bytes"),
        min(md5(col("content"))).as("content_md5"))
  }

  /** Schema-EVOLUTION read: generation 1 writes `(doc_id, n_chars)`,
    * generation 2 of the same table adds `lang` — `mergeSchema=true`
    * reads both generations as one table, old rows NULL-filling the new
    * column, with the generation a discovered partition column. This is
    * the append-only schema-change story a long-lived 100 TB table
    * lives on (the alternative — rewriting every historical file on
    * each column add — is a full-table write). The aggregate exposes
    * the NULL accounting per generation, so the oracle gates the fill
    * semantics, not just the row counts. */
  def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    val out = stage(s"evolve_${math.abs(d.hashCode)}")
    val docs = documents(s, d)
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/gen=1")
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("n_chars"), col("lang"))
      .write.mode("overwrite").parquet(s"$out/gen=2")
    s.read.option("mergeSchema", "true").parquet(out)
      .groupBy(col("gen"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("lang")).as("n_lang_present"),
        sum(col("n_chars")).as("chars_sum"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy(col("gen"))
  }

  // --------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_schema_evolution" -> (schemaEvolution _),
    "q_sink_csv_roundtrip" -> (csvRoundtrip _),
    "q_sink_orc_roundtrip" -> (orcRoundtrip _),
    "q_source_corrupt" -> (corruptSource _),
    "q_sink_xml_roundtrip" -> (xmlRoundtrip _),
    "q_sink_json_roundtrip" -> (jsonRoundtrip _),
    "q_sink_text_roundtrip" -> (textRoundtrip _),
    "q_source_binary" -> (binarySource _)
  )

  val oracle: Map[String, String] = Map(
    // replay the two write generations as a union: gen 1 rows carry no
    // lang (NULL), gen 2 rows do — COUNT(lang) exposes the fill
    "q_schema_evolution" ->
      """WITH u AS (
        |  SELECT 1 AS gen, doc_id, n_chars, CAST(NULL AS VARCHAR) AS lang
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT 2, doc_id, n_chars, lang
        |  FROM documents WHERE doc_id % 2 = 1)
        |SELECT gen, COUNT(*) AS n_docs, COUNT(lang) AS n_lang_present,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM u GROUP BY gen ORDER BY gen""".stripMargin,

    "q_sink_xml_roundtrip" ->
      """SELECT COUNT(*) AS n_regions, MIN(r_name) AS first_region,
        |  CAST(SUM(r_regionkey) AS BIGINT) AS key_sum
        |FROM region""".stripMargin,

    // every 5th nation row is malformed by construction; PERMISSIVE mode
    // must quarantine exactly those (their columns stay null, so the
    // corrupt group's min name is NULL on both sides)
    "q_source_corrupt" ->
      """SELECT n_nationkey % 5 = 0 AS is_corrupt, COUNT(*) AS n,
        |  MIN(CASE WHEN n_nationkey % 5 = 0 THEN CAST(NULL AS VARCHAR)
        |           ELSE n_name END) AS first_name
        |FROM nation GROUP BY 1 ORDER BY is_corrupt""".stripMargin,

    "q_sink_orc_roundtrip" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_quantity > 25
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_sink_csv_roundtrip" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS regionkey,
        |  COUNT(*) AS n_nations, MIN(n_name) AS first_name
        |FROM nation GROUP BY 1 ORDER BY regionkey""".stripMargin,

    "q_sink_json_roundtrip" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        |  MIN(epoch_ms(o_orderdate)) AS first_date_ms
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_sink_text_roundtrip" ->
      (graft.operators.Parity.oracle("q_parity_gather")
        .replace(
          """SELECT app_id,
            |  COUNT(*) AS n_results,
            |  CAST(SUM(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
            |  CAST(SUM(CASE WHEN is_error THEN 0 ELSE 1 END) AS BIGINT) AS n_ok,
            |  COUNT(DISTINCT operation) AS n_ops
            |FROM results GROUP BY app_id ORDER BY app_id""".stripMargin,
          """SELECT operation || ':' AS op_colon, COUNT(*) AS n,
            |  CAST(SUM(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
            |FROM results GROUP BY 1 ORDER BY op_colon""".stripMargin)),

    // the staged blob is one file of '\n'-terminated result rows in doc
    // order — its bytes, hence md5 and length, derive from the source table
    "q_source_binary" ->
      (graft.operators.Parity.oracle("q_parity_gather")
        .replace(
          """SELECT app_id,
            |  COUNT(*) AS n_results,
            |  CAST(SUM(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
            |  CAST(SUM(CASE WHEN is_error THEN 0 ELSE 1 END) AS BIGINT) AS n_ok,
            |  COUNT(DISTINCT operation) AS n_ops
            |FROM results GROUP BY app_id ORDER BY app_id""".stripMargin,
          """SELECT CAST(1 AS BIGINT) AS n_files,
            |  CAST(SUM(octet_length(encode(result_row)) + 1) AS BIGINT) AS total_bytes,
            |  md5(string_agg(result_row || chr(10), '' ORDER BY doc_id)) AS content_md5
            |FROM results""".stripMargin))
  )
}
